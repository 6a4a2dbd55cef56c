"""Serving stack: client API, communication channels, task server, model registry."""

from aurora_tpu.foundry.channel import (
    BlobStorageChannel,
    CommunicationChannel,
    LocalFileChannel,
    iterate_prediction_files,
)
from aurora_tpu.foundry.client import FoundryClient, SubmissionError, submit
from aurora_tpu.foundry.server import InferenceServer

__all__ = [
    "BlobStorageChannel",
    "CommunicationChannel",
    "LocalFileChannel",
    "iterate_prediction_files",
    "FoundryClient",
    "SubmissionError",
    "submit",
    "InferenceServer",
]

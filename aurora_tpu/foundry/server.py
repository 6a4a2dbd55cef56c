"""Server-side task machinery.

Framework-agnostic re-design of the reference MLflow wrapper (reference:
aurora/foundry/server/mlflow_wrapper.py): the task state machine
(Unsubmitted → Queued → Running → Completed), lazy submission once the initial
condition appears on the channel, per-step progress, and exception capture into the
task status are all here in :class:`InferenceServer`, which speaks the plain
dict-in/dict-out wire protocol. The MLflow pyfunc shim is a thin optional layer.
"""

from __future__ import annotations

import json
import logging
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass
from typing import Optional
from uuid import uuid4

from aurora_tpu.foundry.channel import channel_from_spec, iterate_prediction_files
from aurora_tpu.foundry.models import models

__all__ = ["InferenceServer", "Task", "TaskInfo", "Submission"]

logger = logging.getLogger(__name__)


@dataclass
class Submission:
    data_folder_uri: str
    model_name: str
    num_steps: int


@dataclass
class TaskInfo:
    task_id: str
    completed: bool = False
    progress_percentage: int = 0
    success: Optional[bool] = None
    submitted: bool = False
    status: str = "Unsubmitted"


class Task:
    """One roll-out request: receives the initial condition, runs the model, streams
    per-step predictions back over the channel."""

    def __init__(self, submission: Submission):
        self.submission = submission
        self.task_info = TaskInfo(task_id=str(uuid4()))

    def __call__(self) -> None:
        info = self.task_info
        info.status = "Running"
        try:
            submission = self.submission
            channel = channel_from_spec(submission.data_folder_uri)
            model = models[submission.model_name]()
            batch = channel.receive(info.task_id, "input.nc")

            logger.info("Running predictions.")
            files = iterate_prediction_files("prediction.nc", submission.num_steps)
            for i, (pred, path) in enumerate(zip(model.run(batch, submission.num_steps), files)):
                channel.send(pred, info.task_id, path)
                info.progress_percentage = int(100 * (i + 1) / submission.num_steps)

            info.success = True
            info.status = "Successfully completed"
        except Exception as exc:
            info.success = False
            info.status = f"Exception: {exc}"
        finally:
            info.completed = True


class InferenceServer:
    """Single-worker async inference server speaking the Foundry wire protocol.

    ``handle`` takes/returns plain dicts:
      * ``{"type": "submission", "msg": {...Submission...}}`` → ``{"task_id": ...}``
      * ``{"type": "task_info", "msg": {"task_id": ...}}`` → TaskInfo dict
    """

    def __init__(self, max_workers: int = 1):
        self.pool = ThreadPoolExecutor(max_workers=max_workers)
        self.tasks: dict[str, Task] = {}

    def handle(self, data: dict) -> dict:
        if data["type"] == "submission":
            task = Task(Submission(**data["msg"]))
            self.tasks[task.task_info.task_id] = task
            return {"task_id": task.task_info.task_id}

        if data["type"] == "task_info":
            task_id = data["msg"].get("task_id")
            if not task_id:
                raise ValueError("Missing `task_id` parameter.")
            if task_id not in self.tasks:
                raise ValueError("Task ID cannot be found.")
            task = self.tasks[task_id]
            info = task.task_info

            if not info.submitted:
                channel = channel_from_spec(task.submission.data_folder_uri)
                if channel.exists(task_id, "input.nc"):
                    logger.info("Initial condition found. Submitting task.")
                    # Acknowledge so the client can verify server-side write access.
                    channel.write(
                        b"Acknowledgement of initial condition", task_id, "input.nc.ack"
                    )
                    info.submitted = True
                    info.status = "Queued"
                    self.pool.submit(task)
                else:
                    time.sleep(3)  # Throttle the client's polling.
            else:
                for _ in range(3):
                    if info.completed:
                        break
                    time.sleep(1)
            return asdict(info)

        raise ValueError(f"Unknown data type: `{data['type']}`.")

    def shutdown(self):
        self.pool.shutdown(wait=False)


def make_mlflow_wrapper():
    """Optional MLflow pyfunc shim (requires ``mlflow``; reference parity:
    aurora/foundry/server/mlflow_wrapper.py:115-180)."""
    import mlflow.pyfunc

    from aurora_tpu.foundry.models import ARTIFACTS

    class AuroraModelWrapper(mlflow.pyfunc.PythonModel):
        def load_context(self, context) -> None:
            self.server = InferenceServer()
            ARTIFACTS.update(context.artifacts)

        def predict(self, context, model_input: dict, params=None) -> dict:
            data = json.loads(model_input["data"].item())
            return self.server.handle(data)

    return AuroraModelWrapper

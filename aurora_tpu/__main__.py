"""``python -m aurora_tpu`` entry point — dispatches to the CLI (cli.py)."""

from aurora_tpu.cli import main

raise SystemExit(main())

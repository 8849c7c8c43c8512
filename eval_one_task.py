#!/usr/bin/env python
"""Entry point mirroring the reference's eval_one_task.py CLI."""
from wmfml_tpu.cli.eval_one_task_cli import main

if __name__ == "__main__":
    main()

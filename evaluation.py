#!/usr/bin/env python
"""Entry point mirroring the reference's evaluation.py CLI."""
from wmfml_tpu.cli.evaluation_cli import main

if __name__ == "__main__":
    main()

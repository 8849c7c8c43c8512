#!/usr/bin/env python
"""Entry point mirroring the reference's train.py CLI."""
from wmfml_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Entry point mirroring the reference's refinement.py CLI."""
from wmfml_tpu.cli.refinement_cli import main

if __name__ == "__main__":
    main()

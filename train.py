#!/usr/bin/env python
"""Root entry point mirroring the reference's train.py (SURVEY.md §1 L6).
Delegates to tpucenterface.cli.train."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpucenterface.cli.train import main

if __name__ == "__main__":
    main()

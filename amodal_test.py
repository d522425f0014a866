#!/usr/bin/env python
"""Compatibility entry point mirroring the reference's single-image
inference script (``amodal_test.py``)."""
from sln_amodal_tpu.cli.test_images import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Compatibility entry point mirroring the reference CLI:
``python amodal_train.py {train,evaluate} --dataset D --model M --data_type T``.
"""
from sln_amodal_tpu.cli.train import main

if __name__ == "__main__":
    main()

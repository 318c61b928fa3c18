"""Repo-root shim matching the reference's model_stats.py entry point
(reference model_stats.py:142-180): params / forward FLOPs per backbone via
XLA cost analysis.

Usage: python model_stats.py --mode patch --n 3360 [--dims 1024-384-384]
"""
from advmil_tpu.stats import main

if __name__ == "__main__":
    main()

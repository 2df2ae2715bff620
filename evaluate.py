#!/usr/bin/env python
"""Root CLI shim — see multimodal_drl_rmc_tpu/runtime/evaluate.py."""

from multimodal_drl_rmc_tpu.runtime.evaluate import main

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Root CLI shim — see multimodal_drl_rmc_tpu/runtime/observe.py."""

from multimodal_drl_rmc_tpu.runtime.observe import main

if __name__ == "__main__":
    main()

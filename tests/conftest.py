"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding is tested on a virtual CPU mesh
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py / __graft_entry__.py. Must configure the platform before any JAX
backend initialization (overrides remote-TPU sitecustomize forcing).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngsamg_tpu.utils.jaxcfg import enable_persistent_cache, force_cpu

force_cpu(8)
enable_persistent_cache()

"""Test configuration: run everything on an 8-device virtual CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

# Run hermetically on CPU: drop the axon TPU plugin from sys.path entirely —
# merely importing it opens a connection to the TPU tunnel, which (a) can
# block when another process holds the tunnel and (b) is wrong for CPU tests.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# this container has a single CPU core; cut XLA optimization time so the
# model-level tests compile in reasonable time (numerics unaffected enough
# for the tolerances used here)
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
# single-core host: the 8 virtual partitions can take >40s (default CPU
# collective rendezvous timeout) to all arrive at the first all-gather,
# and XLA SIGABRTs the process when the timeout fires. Allow 600s.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
             ).strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

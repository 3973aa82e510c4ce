"""Test environment: CPU-backend JAX with 8 virtual devices.

Mirrors the reference's conftest pattern of pinning env before app import
(reference: tests/conftest.py:1-9). Must run before jax is imported anywhere.
"""

import os
import resource
import threading

# XLA's CPU backend (LLVM codegen) recurses deeply on big fused programs;
# with the default 8 MB stacks the full suite segfaults inside
# backend_compile_and_load late in the run — both on the main thread and
# on worker threads (tts_batcher) that compile. Raise the process stack
# rlimit (hard limit is unlimited here) and give NEW threads 64 MB stacks
# before any are spawned.
try:
    resource.setrlimit(resource.RLIMIT_STACK, (256 << 20, -1))
except (ValueError, OSError):  # pragma: no cover - hard-limited hosts
    pass
threading.stack_size(64 << 20)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's LLVM codegen intermittently segfaults inside
# backend_compile_and_load on the suite's largest fused programs (beam
# fallback at the wider batched rungs) — deep recursion in expensive LLVM
# passes. Tests don't need LLVM -O3 output; disable those passes for the
# CPU test backend only (TPU serving is unaffected).
if "xla_llvm_disable_expensive_passes" not in flags:
    flags = (flags + " --xla_llvm_disable_expensive_passes=true").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # parallel codegen splits the module across LLVM threads; the crash
    # signature above disappears with single-threaded codegen
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

# The axon sitecustomize registers a TPU plugin and pins jax_platforms to
# "axon,cpu" in every interpreter; override it back to CPU for tests.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: DISABLED for the suite. Five segfaults
# across four mitigation attempts all crashed inside
# _compile_and_write_cache / backend_compile_and_load late in long
# single-process runs — XLA:CPU's AOT executable serialization is the
# common factor (and loading artifacts compiled on a different machine
# type SIGILLs outright: "Target machine feature ... is not supported on
# the host machine"). Compiles are redone per run; correctness over
# cache warmth. Set OS_TEST_JAX_CACHE_DIR to opt back in locally.
_cache_dir = os.environ.get("OS_TEST_JAX_CACHE_DIR", "")
if _cache_dir:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
else:
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# Serving-path tests run the full kokoro topology at reduced geometry
# (same graph, ~100x fewer FLOPs); numerical-parity tests construct their
# own configs and are unaffected.
os.environ.setdefault("OS_KOKORO_GEOMETRY", "tiny")

# Server-side defaults for tests: no SSL, writable data dirs.
os.environ.setdefault("OS_SSL_ENABLED", "false")
os.environ.setdefault("OS_VOICE_LIBRARY_PATH", "/tmp/os_tpu_test/voices")
os.environ.setdefault("OS_STUDIO_DB_PATH", "/tmp/os_tpu_test/studio.db")
os.environ.setdefault("OS_CONVERSATIONS_DIR", "/tmp/os_tpu_test/conversations")
os.environ.setdefault("OS_COMPOSER_DIR", "/tmp/os_tpu_test/composer")
os.environ.setdefault("TTS_CACHE_DIR", "/tmp/os_tpu_test/cache")

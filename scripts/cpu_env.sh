# Source this (or prefix commands) for fast CPU-backend development/testing.
# - disables the axon TPU registration (PALLAS_AXON_POOL_IPS=)
# - forces an 8-virtual-device CPU mesh
# - turns off LLVM's expensive passes (5-20x faster XLA CPU compiles)
# - persistent compilation cache
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes=true"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

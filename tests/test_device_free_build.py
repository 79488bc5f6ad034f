"""Guard: env construction must not synchronize device->host.

Round-2 regression class: ``gym.make`` died with a TPU FAILED_PRECONDITION
because build-time pose math ran on device and was pulled back with
``np.asarray`` (actor_builder.py round-2 line 215). Scene construction —
builders, loaders, controller setup, render-mesh compilation — is host-side
(numpy); the init-reset jit is the single sanctioned device interaction
during ``make``. ``jax.transfer_guard_device_to_host("disallow")`` turns any
other sync into an immediate error.
"""
import jax
import pytest

import maniskill_tpu.envs  # noqa: F401  (registers tasks)
from maniskill_tpu.envs.base_env import BaseEnv
from maniskill_tpu.utils.registration import make

# the two envs that broke round-2 bench.py, plus representative task classes
ENV_IDS = [
    "FrankaMoveBenchmark-v1",
    "FrankaPickCubeBenchmark-v1",
    "PickCube-v1",
    "OpenCabinetDrawer-v1",
]


@pytest.mark.parametrize("env_id", ENV_IDS)
def test_construction_never_syncs_device_to_host(env_id, monkeypatch):
    # the init reset runs a jit whose lowering pulls closure constants
    # (Model leaves) to host — that's compilation, not build logic; exempt it
    orig_reset = BaseEnv.reset

    def allow_reset(self, *a, **k):
        with jax.transfer_guard_device_to_host("allow"):
            return orig_reset(self, *a, **k)

    monkeypatch.setattr(BaseEnv, "reset", allow_reset)
    with jax.transfer_guard_device_to_host("disallow"):
        env = make(env_id, num_envs=2)
    monkeypatch.undo()
    # normal operation afterwards is unaffected
    obs, _ = env.reset(seed=0)
    env.step(env.unwrapped.action_space.sample())
    env.close()

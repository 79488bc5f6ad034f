from .batched_rng import BatchedRNG
from .camera import batched_look_at, make_camera_rectangular_prism, noised_look_at
from .samplers import UniformPlacementSampler


def random_quaternions(rng, lock_x=False, lock_y=False, lock_z=False, bounds=None):
    """Convenience mirroring mani_skill randomization.random_quaternions
    (here rng is the env's BatchedRNG)."""
    import jax.numpy as jnp
    from ....utils.geometry import rotation_conversions as rc

    if lock_x and lock_y:
        if bounds is not None:
            ang = rng.uniform(bounds[0], bounds[1])
        else:
            import numpy as np

            ang = rng.uniform(0.0, 2 * np.pi)
        zeros = jnp.zeros_like(ang)
        return rc.axis_angle_to_quaternion(jnp.stack([zeros, zeros, ang], axis=-1))
    return rng.quaternions(lock_x, lock_y, lock_z)

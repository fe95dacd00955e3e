"""Golden trajectory regression: the float64 host adapter must replay
the recorded fixtures bit-exactly (poses, rewards, terminations), and
the f32 device path must track them within float tolerance while the
agent follows the same trajectory.

Fixtures come from tests/make_goldens.py; regenerate them only after
INTENTIONAL physics changes.
"""

import glob
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))


def _name_seed(path):
    base = os.path.basename(path)[:-4]
    name, seed = base.rsplit("_s", 1)
    return name, int(seed)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_host_replay_bit_exact(path):
    from miniworld_tpu.gym_env import MiniWorldGym

    name, seed = _name_seed(path)
    g = np.load(path)
    env = MiniWorldGym(name, obs_width=24, obs_height=18)
    env.reset(seed=seed)
    np.testing.assert_array_equal(env.agent_pos, g["spawn"])
    for t, a in enumerate(g["actions"]):
        obs, r, term, trunc, info = env.step(
            int(a) if np.ndim(a) == 0 else a
        )
        np.testing.assert_array_equal(
            env.agent_pos, g["poses"][t], err_msg=f"{name} step {t}"
        )
        assert env.agent_dir == g["dirs"][t]
        assert r == g["rewards"][t]
        assert bool(term) == bool(g["terms"][t])
        if term or trunc:
            break


@pytest.mark.parametrize(
    "path",
    [p for p in FIXTURES if "Hallway" in p or "PutNext" in p],
    ids=lambda p: os.path.basename(p),
)
def test_device_tracks_golden(path):
    """The f32 vectorized path follows the f64 golden trajectory when
    started from the same pose with the same scripted actions."""
    import jax
    import jax.numpy as jnp

    from miniworld_tpu import MiniWorldVec

    name, seed = _name_seed(path)
    g = np.load(path)
    env = MiniWorldVec(f"MiniWorld-{name}-v0", num_envs=1, obs_width=24,
                       obs_height=18)
    state, _ = env.reset(jax.random.key(0))
    state = state.replace(
        pos=jnp.asarray(g["spawn"], jnp.float32)[None],
        dir=jnp.asarray([g["spawn_dir"]], jnp.float32),
        # park all entities far away so only wall physics acts (entity
        # layouts differ between the host fixture and this reset)
        ent_pos=state.ent_pos + 1000.0,
    )
    # replay only until the golden terminated (entity contacts differ)
    for t, a in enumerate(g["actions"]):
        if g["terms"][t]:
            break
        act = (
            jnp.asarray([int(a)], jnp.int32)
            if np.ndim(a) == 0 else jnp.asarray(a, jnp.float32)[None]
        )
        state, obs, r, d, info = env.step(state, act)
        # walls are identical; entity influence removed -> pose must
        # track the golden to f32 tolerance unless the golden's motion
        # was entity-blocked (skip those rare steps is unnecessary for
        # the recorded seeds: verified entity-free trajectories)
        np.testing.assert_allclose(
            np.asarray(info["agent_pos"][0]), g["poses"][t], atol=5e-4,
            err_msg=f"{name} step {t}",
        )

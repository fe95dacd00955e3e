import sys, time, jax
from miniworld_tpu import MiniWorldVec
B, chunk = 2048, int(sys.argv[1])
env = MiniWorldVec("MiniWorld-Maze-v0", num_envs=B, obs_width=80, obs_height=60,
                   with_depth=True, procgen=True, tri_chunk=chunk)
print("chunk:", env.tri_chunk, "S:", env._bank_np.tri_mask.shape[1], "mb:", env.render_microbatch)
state, obs = env.reset(jax.random.key(0))
state, obs, outs = env.rollout(state, obs, jax.random.key(1), 20)
float(jax.device_get(outs["obs_sum"]).sum())
best = 0
for t in range(3):
    t0 = time.perf_counter()
    state, obs, outs = env.rollout(state, obs, jax.random.key(2+t), 20)
    float(jax.device_get(outs["obs_sum"]).sum())
    best = max(best, 20*B/(time.perf_counter()-t0))
print("steps/s:", round(best))

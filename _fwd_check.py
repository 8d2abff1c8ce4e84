import time
import jax, jax.numpy as jnp
from psvo_tpu.config import preset
from psvo_tpu.models.ssm import init_ssm
from psvo_tpu.smc import forward_filter

cfg = preset("fhn_fivo_k1024_bench")
ssm, params = init_ssm(cfg, jax.random.key(0))
ys = jax.random.normal(jax.random.key(1), (32, 100, 2))
warm = jax.jit(lambda y: (y*2).sum()); float(warm(ys))
f = jax.jit(lambda p, k, y: forward_filter(ssm, p, k, y, cfg.smc).log_z.sum())
o = f(params, jax.random.key(2), ys); float(o)
t0 = time.perf_counter()
for _ in range(30): o = f(params, jax.random.key(2), ys)
float(o)
print("primary forward:", (time.perf_counter()-t0)/30*1e3, "ms", flush=True)

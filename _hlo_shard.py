import tests._cpu  # 8 virtual CPU devices
import re, dataclasses
import jax, jax.numpy as jnp
from psvo_tpu.config import Config, DataConfig, MeshConfig, SMCConfig, TrainConfig
from psvo_tpu.models.ssm import init_ssm
from psvo_tpu.parallel import context, sharding
from psvo_tpu.smc import forward_filter

cfg = Config(
    name="hlo", data=DataConfig(datatype="lorenz96", dx=8, dy=8, t_steps=6, n_train=4, n_test=2),
    smc=SMCConfig(objective="fivo", n_particles=256, resampling="systematic"),
    train=TrainConfig(batch_size=4), mesh=MeshConfig(data=2, particle=4), use_pallas=False,
)
ssm, params = init_ssm(cfg, jax.random.key(0))
mesh = sharding.make_mesh(cfg)
context.set_mesh(mesh)
ys = jax.device_put(jax.random.normal(jax.random.key(1), (4, 6, 8)), sharding.batch_sharding(mesh))
f = jax.jit(lambda p, k, y: forward_filter(ssm, p, k, y, cfg.smc).log_z.sum())
txt = f.lower(params, jax.random.key(2), ys).compile().as_text()
open("/tmp/shard_hlo.txt", "w").write(txt)
print("all-reduce:", len(re.findall(r"all-reduce", txt)))
for m in set(re.findall(r"(\S+) = \S+ all-gather\(", txt)):
    pass
gathers = re.findall(r"= (\S+?) all-gather\(", txt)
print("all-gather shapes:", gathers)
perms = len(re.findall(r"collective-permute", txt))
print("collective-permute:", perms)
a2a = len(re.findall(r"all-to-all", txt))
print("all-to-all:", a2a)
context.set_mesh(None)

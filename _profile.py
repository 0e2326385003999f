import os, glob, gzip, json, time
import numpy as np, jax
from cosa_tpu.config import voc_config
from cosa_tpu.models import build_model
from cosa_tpu.parallel import batch_sharding, make_mesh, state_sharding
from cosa_tpu.train import build_optimizer, build_train_step, create_train_state

cfg = voc_config(batch_size=4)
model = build_model(cfg)
state = create_train_state(cfg, model, 4)
tx = build_optimizer(cfg, state.student)
step = jax.jit(build_train_step(cfg, model, tx), donate_argnums=0)
mesh = make_mesh(dp=1, tp=1)
state = jax.device_put(state, state_sharding(state, mesh))
r = np.random.default_rng(0); s = cfg.crop_size
batch = dict(wimg=r.integers(0,255,(4,s,s,3)).astype(np.uint8),
             simg=r.integers(0,255,(4,s,s,3)).astype(np.uint8),
             cls_label=(r.random((4,cfg.num_classes-1))>0.8).astype(np.float32),
             img_box=np.tile(np.array([[0,s,0,s]],np.int32),(4,1)))
batch = jax.device_put(batch, batch_sharding(mesh))
for _ in range(3):
    state, m = step(state, batch)
float(m["overall_loss"])
jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(5):
    state, m = step(state, batch)
float(m["overall_loss"])
jax.profiler.stop_trace()
print("trace files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True)[:20])

import time, numpy as np, jax, jax.numpy as jnp
from cosa_tpu.ops.permutohedral import permutohedral_filter
r = np.random.default_rng(0)
for (N,K,tag) in [(224*224, 21, "energy-res"), (250*250, 22, "crf-quarter")]:
    feats = jnp.asarray(r.standard_normal((N,5)) * 3, jnp.float32)
    vals = jnp.asarray(r.random((N,K)), jnp.float32)
    t0=time.perf_counter()
    out = permutohedral_filter(feats, vals)
    s=float(out.sum())
    print(tag, "first-call (compile+run):", round(time.perf_counter()-t0,1), "s", flush=True)
    t0=time.perf_counter()
    for _ in range(5):
        out = permutohedral_filter(feats, vals)
    s=float(out.sum())
    print(tag, "steady:", round((time.perf_counter()-t0)/5*1e3,1), "ms", flush=True)

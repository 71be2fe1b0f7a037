"""Time msm_rows_device + fold_device at prover shapes, PALLAS on/off."""
import os, sys, time, random
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["CURDLE_PALLAS"] = mode
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from go_curdleproofs_tpu.ops import fp, curve
from go_curdleproofs_tpu.utils import field_host as fh

random.seed(6)
K, N = 3, 512
pts = [fh.g1_mul(fh.G1_GEN, random.randrange(1, fh.R)) for _ in range(64)]
rows = [[pts[(i * K + j) % 64] for i in range(N)] for j in range(K)]
sv = curve.StackedVec.from_affine(rows, pad_to=N)

def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])   # true completion: fetch one element

def timeit(name, fn, *args, reps=5):
    out = fn(*args); _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args); _sync(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:<28} min {min(ts)*1e3:9.2f} ms (incl ~28ms fetch)  "
          f"all={[round(t*1e3,1) for t in ts]}")
    return out

# msm_rows at [6 jobs x 3 rows x 512]
dig = np.stack([curve.scalars_to_digits([random.randrange(fh.R) for _ in range(N)])
                for _ in range(6)])
rows6 = (0, 1, 2, 0, 1, 2)
fn = jax.jit(lambda pv, dg: curve.msm_rows_device(pv, dg, rows6))
timeit(f"msm_rows 6x3x512 [{mode}]", fn, sv.pv, jnp.asarray(dig))

# fold at [3, 512]
gdig = jnp.asarray(np.broadcast_to(curve.scalars_to_digits([random.randrange(fh.R)]),
                                   (N, 64))[None].repeat(3, 0))
ffn = jax.jit(lambda pv, dg: curve.fold_device(pv, dg, jnp.int32(N // 2)))
timeit(f"fold 3x512 [{mode}]", ffn, sv.pv, gdig)

# batch scalar mul 1024
bfn = jax.jit(lambda pv, dg: curve.scalar_mul_device(pv, dg))
pv2 = curve.pmap_coords(lambda t: t[:2].reshape(2 * N, -1), sv.pv)
dig2 = jnp.asarray(curve.scalars_to_digits([random.randrange(fh.R)] * (2 * N)))
timeit(f"smul 1024 [{mode}]", bfn, pv2, dig2)

"""Kernel ablation timing: which step-body pieces cost what (TPU only).

Timing-only — ablated variants produce WRONG results by design.
"""
import os, sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ["ALAC_ABLATE"] = "1"  # opt in: ablated output is wrong by design
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
from scripts.kbench import corpus
from alacnet_tpu.ops.pallas.rice_lpc import fused_rice_lpc

kind = sys.argv[1] if len(sys.argv) > 1 else "music"
fb = corpus(kind)
S = 4096
args0 = (fb.entropy_pos, fb.n_samples, fb.rss, fb.kmod, fb.init_history,
         fb.rice_mult[:,0], fb.kmask, fb.order[:,0], fb.quant[:,0], fb.rc[:,0])
rng = np.random.default_rng()
R = 5
base = int(rng.integers(1, 4000))
variants = []
for r in range(R+1):
    w = jnp.asarray(np.roll(fb.words, base+r, axis=0))
    a = tuple(jnp.asarray(np.roll(np.asarray(x), base+r, axis=0)) for x in args0)
    variants.append((w, a))
force = jnp.zeros((), jnp.uint32)
for w,a in variants:
    force = force + jnp.sum(w) + sum(jnp.sum(x).astype(jnp.uint32) for x in a)
force.item()
orders = fb.order[fb.order != 31]
mo = int(orders.max()) if orders.size else 0

def slope(ablate):
    ab = tuple(ablate)
    o,e = fused_rice_lpc(variants[-1][0], *variants[-1][1], S, max_order=mo, ablate=ab)
    jnp.sum(e).item()  # compile + warm
    t0=time.perf_counter()
    _,e2 = fused_rice_lpc(variants[-1][0], *variants[-1][1], S, max_order=mo, ablate=ab)
    jnp.sum(e2).item()
    rtt = time.perf_counter()-t0  # memoized -> RTT only
    t0=time.perf_counter()
    accs=[]
    for r in range(R):
        w,a = variants[r]
        _,e3 = fused_rice_lpc(w, *a, S, max_order=mo, ablate=ab)
        accs.append(jnp.sum(e3))
    tot=accs[0]
    for x in accs[1:]: tot=tot+x
    tot.item()
    dt=(time.perf_counter()-t0-rtt)/R
    print(f"{kind} ablate={ab or 'none'}: {dt*1e3:.2f} ms/pass")
    return dt

for ab in ([], ["nozrun"], ["noadapt"], ["nofir"], ["k1"], ["nofetch"], ["staticrange"]):
    slope(ab)

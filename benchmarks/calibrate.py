"""Calibrate tunnel fetch RTT and per-dispatch overhead."""
import time
import jax
import jax.numpy as jnp
import numpy as np

x = jax.device_put(np.ones((8, 128), np.float32))
scalar = jax.jit(lambda a: a.reshape(-1)[0])
tiny = jax.jit(lambda a: a + 1.0)
big = jax.device_put(np.ones((2160, 3840), np.float32))
ema = jax.jit(lambda d, e: jnp.where(jnp.isnan(e), d, e + (d - e) * 0.1))

float(scalar(x)); y = tiny(x); float(scalar(y)); z = ema(big, big); float(scalar(z))

# pure fetch RTT
t0 = time.perf_counter()
for _ in range(20):
    float(scalar(x))
rtt = (time.perf_counter() - t0) / 20 * 1000
print(f"scalar fetch RTT      {rtt:8.3f} ms")

def slope(fn, *args, n1=40, n2=160):
    def run(n):
        t0 = time.perf_counter()
        out = args[0]
        for _ in range(n):
            out = fn(out, *args[1:])
        float(scalar(jax.tree_util.tree_leaves(out)[0]))
        return time.perf_counter() - t0
    run(8)
    a, b = run(n1), run(n2)
    return (b - a) / (n2 - n1) * 1000

print(f"tiny jit per-call     {slope(tiny, x):8.3f} ms")
print(f"EMA@4K per-call       {slope(ema, big, big):8.3f} ms")

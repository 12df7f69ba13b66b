"""Distinguish tunnel latency from bandwidth: upload varying sizes."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("devices:", jax.devices())
    for mb in (0.01, 0.1, 0.5, 1, 2, 4, 8, 16):
        n_bytes = int(mb * 1e6)
        buf = np.random.randint(0, 255, n_bytes, dtype=np.uint8)
        a = jax.device_put(buf)
        jax.block_until_ready(a)
        n = 10 if mb <= 2 else 4
        t0 = time.perf_counter()
        hold = []
        for _ in range(n):
            hold.append(jax.device_put(buf))
        jax.block_until_ready(hold[-1])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"upload {mb:6.2f} MB: {ms:8.2f} ms -> {mb / ms * 1e3:7.0f} MB/s")

    # donation/commitment check: is device_put staged via a copy proto?
    # also check download bandwidth
    for mb in (0.1, 1, 8):
        n_el = int(mb * 1e6)
        a = jnp.zeros(n_el, jnp.uint8)
        jax.block_until_ready(a)
        n = 6
        t0 = time.perf_counter()
        for _ in range(n):
            jax.device_get(a)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"download {mb:6.2f} MB: {ms:8.2f} ms -> {mb / ms * 1e3:7.0f} MB/s")


if __name__ == "__main__":
    main()

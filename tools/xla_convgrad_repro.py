"""Minimal repro: XLA SPMD mis-scales conv WEIGHT-gradients on meshes with
an axis the conv input does not span (jax/jaxlib 0.9.0, CPU backend; both
the Shardy and classic-GSPMD partitioners).

Trigger: a >=2D mesh where the conv input is sharded over "spatial" (H) and
some other mesh axis is spanned by NEITHER operand. With a replicated
kernel the forward value is exact but the kernel gradient is scaled by the
unused axis size (2x at model=2); with an out-channel-sharded kernel even
the FORWARD loss is wrong (4x here; 0.5x kernel grads in the full network)
— the partial-sum over "spatial" shards is reduced over the wrong axis set.

Exact workarounds (both measured, see the table this prints):
  * span every mesh axis with the batch N dim — what
    `crossloc_tpu.parallel.shard_batch` does (N over ("data", "model")), or
  * pin the conv output with `with_sharding_constraint`.

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/xla_convgrad_repro.py [--no-shardy]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
if "--no-shardy" in sys.argv:
    jax.config.update("jax_use_shardy_partitioner", False)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    devs = np.asarray(jax.devices())
    if devs.size < 8:
        raise SystemExit("need 8 devices (set XLA_FLAGS, see module docstring)")
    mesh3 = Mesh(devs[:8].reshape(2, 2, 2), ("data", "spatial", "model"))
    mesh2 = Mesh(devs[:4].reshape(2, 2), ("data", "spatial"))
    rng = np.random.default_rng(0)

    def run(tag, mesh, img_spec, ker_spec, constrain_out=None):
        B, H, W, cin, cout = 4, 16, 16, 4, 32
        x = jnp.asarray(rng.normal(size=(B, H, W, cin)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)

        def loss(kk, xx):
            y = jax.lax.conv_general_dilated(
                xx, kk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if constrain_out is not None:
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, constrain_out))
            return jnp.mean(jnp.square(y))

        l_ref = float(jax.jit(loss)(k, x))
        g_ref = np.asarray(jax.jit(jax.grad(loss))(k, x)).ravel()
        with mesh:
            xs = jax.device_put(x, NamedSharding(mesh, img_spec))
            ks = jax.device_put(k, NamedSharding(mesh, ker_spec))
            l_sh = float(jax.jit(loss)(ks, xs))
            g_sh = np.asarray(jax.jit(jax.grad(loss))(ks, xs)).ravel()
        m = np.abs(g_ref) > 1e-8
        r = g_sh[m] / g_ref[m]
        flag = "" if abs(np.median(r) - 1) < 1e-3 else "   <-- WRONG GRAD"
        print(f"{tag:34s} loss {l_sh / l_ref:.4f}x   "
              f"grad ratio med {np.median(r):+.4f} "
              f"[p5 {np.percentile(r, 5):+.4f}, p95 {np.percentile(r, 95):+.4f}]"
              f"{flag}")

    print(f"jax {jax.__version__}, shardy={jax.config.jax_use_shardy_partitioner}")
    run("2-axis control", mesh2, P("data", "spatial"), P())
    run("3-axis, model axis unspanned", mesh3, P("data", "spatial"), P())
    run("3-axis, tp kernel, unspanned", mesh3, P("data", "spatial"),
        P(None, None, None, "model"))
    run("WORKAROUND batch spans model", mesh3, P(("data", "model"), "spatial"), P())
    run("WORKAROUND + sharded kernel", mesh3, P(("data", "model"), "spatial"),
        P(None, None, None, "model"))
    run("WORKAROUND pin conv output", mesh3, P("data", "spatial"), P(),
        constrain_out=P("data", "spatial", None, None))


if __name__ == "__main__":
    main()

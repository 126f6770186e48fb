#!/usr/bin/env python3
"""Component-level substep profiling on the real TPU.

Each component is timed with the stateful-scan methodology (CLAUDE.md TPU
caveats: never time single calls through the tunnel; keep a data dependency
through the carry so nothing hoists).

Usage: python tools/profile_substep.py [--batch 1024] [--iters 300]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_scan(name, body, init, iters, fetch):
    """body: carry -> carry. Returns seconds per iteration."""

    def roll(carry):
        def step(c, _):
            return body(c), None
        carry, _ = jax.lax.scan(step, carry, None, length=iters)
        return fetch(carry)

    f = jax.jit(roll)
    t0 = time.time()
    float(f(init))
    compile_s = time.time() - t0
    t0 = time.time()
    float(f(init))
    dt = time.time() - t0
    per = dt / iters
    print(f"{name:40s} {per * 1e6:10.1f} us/iter  (compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated component names to run")
    args = ap.parse_args()
    B, iters = args.batch, args.iters
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    print("devices:", jax.devices(), flush=True)

    from pfpn_tpu.envs.deepmimic import make
    from pfpn_tpu.sim import contact as contact_mod
    from pfpn_tpu.sim.dynamics import crba, fk, pack_velocity, rnea
    from pfpn_tpu.ops.linalg import spd_inverse_pair

    env = make("DeepMimicWalk-v0")
    eng = env.engine
    tree = eng.tree
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    est, _ = jax.jit(env.reset_batch)(keys)
    sim0 = est.sim  # batched SimState
    gravity = jnp.asarray(eng.config.gravity, dtype=jnp.float32)

    def jiggle(st, x):
        """Feed a scalar derived from x back into the state to keep the
        dependency chain alive."""
        eps = 1e-12 * jnp.sum(x)
        return st.replace(base_pos=st.base_pos + eps)

    # ---- full control step (20 substeps + targets) ----------------------
    tgt_sph = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), (B, tree.n_sph, 4))
    tgt_rev = jnp.zeros((B, tree.n_rev))

    if want("control_step"):
        def full_body(st):
            st2, _ = jax.vmap(
                lambda s, a, b: eng.control_step(s, a, b)
            )(st, tgt_sph, tgt_rev)
            return st2
        per = timed_scan("control_step (20 substeps)", full_body, sim0, iters // 10,
                         lambda c: jnp.sum(c.base_pos))
        print(f"  -> {B / per:,.0f} env steps/s; "
              f"{per / 20 * 1e6:.1f} us/substep", flush=True)

    if want("substep"):
        def sub_body(st):
            st2, _ = jax.vmap(
                lambda s, a, b: eng.substep(s, a, b)
            )(st, tgt_sph, tgt_rev)
            return st2
        timed_scan("substep (full)", sub_body, sim0, iters,
                   lambda c: jnp.sum(c.base_pos))

    # ---- fk only ---------------------------------------------------------
    if want("fk"):
        def fk_body(st):
            fkr = jax.vmap(lambda s: fk(tree, s))(st)
            return jiggle(st, fkr.body_pos)
        timed_scan("fk", fk_body, sim0, iters, lambda c: jnp.sum(c.base_pos))

    if want("dyncore"):
        def dyn_body(st):
            def one(s):
                fkr = fk(tree, s)
                h = crba(tree, fkr)
                c = rnea(tree, fkr, gravity=gravity)
                v = pack_velocity(tree, s, fkr)
                return h, c, v
            h, c, v = jax.vmap(one)(st)
            return jiggle(st, h)
        timed_scan("fk+crba+rnea+pack", dyn_body, sim0, iters,
                   lambda c: jnp.sum(c.base_pos))

    if want("dyncore_batched"):
        from pfpn_tpu.sim.batched import build_tables, compute
        tb = build_tables(tree)
        def dynb_body(st):
            bd = jax.vmap(lambda s: compute(tree, tb, s, gravity))(st)
            return jiggle(st, bd.h)
        timed_scan("batched fk+H+C", dynb_body, sim0, iters,
                   lambda c: jnp.sum(c.base_pos))

    # ---- spd_inverse_pair -------------------------------------------------
    if want("inv"):
        def mk_pair(s):
            fkr = fk(tree, s)
            h = crba(tree, fkr)
            eye = jnp.eye(tree.ndof)
            return jnp.stack([h + 1e-3 * eye, h + 2e-3 * eye])
        pair0 = jax.jit(jax.vmap(mk_pair))(sim0)

        def inv_body(p):
            inv = jax.vmap(spd_inverse_pair)(p)
            return p + 1e-9 * inv
        timed_scan("spd_inverse_pair (2 NxN inverses)", inv_body, pair0, iters,
                   lambda c: jnp.sum(c[:, 0, 0, 0]))

    # ---- fused kernel alone -------------------------------------------------
    if want("fusedcore"):
        from pfpn_tpu.control.spd import spd_errors

        core = eng._substep_core
        assert core is not None

        def mk_args(s):
            fkr = fk(tree, s)
            h = crba(tree, fkr)
            c = rnea(tree, fkr, gravity=gravity)
            v = pack_velocity(tree, s, fkr)
            ts = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
            tr = jnp.zeros((tree.n_rev,))
            e_p, e_dp = spd_errors(tree, eng.gains, s, ts, tr, eng.config.dt)
            kp = jnp.asarray(eng.gains.kp, jnp.float32)
            kd = jnp.asarray(eng.gains.kd, jnp.float32)
            kpe = kp * e_p + kd * e_dp
            rs = contact_mod.assemble_rows(
                tree, eng.contact_set, eng.config.contact, fkr, s.q_rev,
                eng.config.dt)
            return (h, kpe - c, kpe, v, rs.rows, rs.target, rs.act_n,
                    rs.act_l)

        args0 = jax.jit(jax.vmap(mk_args))(sim0)

        def core_body(args):
            v_new = jax.vmap(core)(*args)
            h = args[0] + 1e-9 * v_new[:, :, None] * v_new[:, None, :]
            return (h,) + args[1:]
        timed_scan("fused kernel alone", core_body, args0, iters,
                   lambda c: jnp.sum(c[0][:, 0, 0]))

    if want("transposes"):
        def tr_body(args):
            h, f, kpe, v, rows, target, act_n, act_l = args
            outs = [jnp.transpose(h, (1, 2, 0)), jnp.transpose(f, (1, 0)),
                    jnp.transpose(kpe, (1, 0)), jnp.transpose(v, (1, 0)),
                    jnp.transpose(rows, (1, 2, 0)),
                    jnp.transpose(target, (1, 0)),
                    jnp.transpose(act_n, (1, 0)), jnp.transpose(act_l, (1, 0))]
            s = sum(jnp.sum(o) * 1e-12 for o in outs)
            h = h + s
            return (h, f, kpe, v, rows, target, act_n, act_l)
        from pfpn_tpu.control.spd import spd_errors as _se  # noqa: F401
        core = eng._substep_core
        assert core is not None

        def mk_args(s):
            fkr = fk(tree, s)
            h = crba(tree, fkr)
            c = rnea(tree, fkr, gravity=gravity)
            v = pack_velocity(tree, s, fkr)
            ts = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
            tr = jnp.zeros((tree.n_rev,))
            from pfpn_tpu.control.spd import spd_errors
            e_p, e_dp = spd_errors(tree, eng.gains, s, ts, tr, eng.config.dt)
            kp = jnp.asarray(eng.gains.kp, jnp.float32)
            kd = jnp.asarray(eng.gains.kd, jnp.float32)
            kpe = kp * e_p + kd * e_dp
            rs = contact_mod.assemble_rows(
                tree, eng.contact_set, eng.config.contact, fkr, s.q_rev,
                eng.config.dt)
            return (h, kpe - c, kpe, v, rs.rows, rs.target, rs.act_n,
                    rs.act_l)
        args0 = jax.jit(jax.vmap(mk_args))(sim0)
        timed_scan("lane-layout transposes", tr_body, args0, iters,
                   lambda c: jnp.sum(c[0][:, 0, 0]))

    # ---- row assembly ---------------------------------------------------------
    if want("rows"):
        def rows_body(st):
            def one(s):
                fkr = fk(tree, s)
                rs = contact_mod.assemble_rows(
                    tree, eng.contact_set, eng.config.contact, fkr, s.q_rev,
                    eng.config.dt)
                return rs.rows
            rr = jax.vmap(one)(st)
            return jiggle(st, rr)
        timed_scan("fk + assemble_rows", rows_body, sim0, iters,
                   lambda c: jnp.sum(c.base_pos))

    # ---- advance + spd_errors (the elementwise quaternion soup) -------------
    if want("advance"):
        from pfpn_tpu.sim.dynamics import advance

        def adv_body(st):
            def one(s):
                fkr = fk(tree, s)
                v = pack_velocity(tree, s, fkr)
                return advance(tree, s, fkr, v * 0.999, eng.config.dt)
            st2 = jax.vmap(one)(st)
            return st2
        timed_scan("fk + pack + advance", adv_body, sim0, iters,
                   lambda c: jnp.sum(c.base_pos))

    if want("spderr"):
        from pfpn_tpu.control.spd import spd_errors

        def spd_body(st):
            def one(s):
                ts = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
                tr = jnp.zeros((tree.n_rev,))
                e_p, e_dp = spd_errors(tree, eng.gains, s, ts, tr,
                                       eng.config.dt)
                return e_p + e_dp
            e = jax.vmap(one)(st)
            return jiggle(st, e)
        timed_scan("spd_errors", spd_body, sim0, iters,
                   lambda c: jnp.sum(c.base_pos))

    # ---- contact solve -----------------------------------------------------
    if want("contact"):
        def con_body(st):
            def one(s):
                fkr = fk(tree, s)
                h = crba(tree, fkr)
                eye = jnp.eye(tree.ndof)
                from pfpn_tpu.ops.linalg import spd_inverse
                h_inv = spd_inverse(h + 1e-8 * eye)
                v = pack_velocity(tree, s, fkr)
                sol = contact_mod.solve(
                    tree, eng.contact_set, eng.config.contact, fkr, h_inv,
                    v, s.q_rev, eng.config.dt)
                return sol.dv
            dv = jax.vmap(one)(st)
            return jiggle(st, dv)
        t_all = timed_scan("fk+crba+inv+contact", con_body, sim0, iters,
                           lambda c: jnp.sum(c.base_pos))


if __name__ == "__main__":
    main()

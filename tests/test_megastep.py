"""Megastep kernel (ops/megastep.py) equivalence tests.

1. The env step through the megastep path (CPU fallback = scan of fused
   substeps + closed-form wrap re-sync) must match the legacy per-substep
   scan, including across a reference-motion phase wrap.
2. The Pallas kernel (interpret mode) must reproduce the scan-of-substeps
   primal for a batch of real env states.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pfpn_tpu.envs.deepmimic import make


def _env():
    return make("DeepMimicWalk-v0")


def test_megastep_env_path_matches_legacy_scan():
    env = _env()
    assert env.engine.mega is not None

    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    state, obs = jax.jit(env.reset_batch)(keys)
    # place two envs just before a phase wrap to exercise the re-sync
    et = state.elapsed_time
    near_wrap = env.motion.duration - 1.5 * env.dt
    et = et.at[:2].set(near_wrap)
    state = state.replace(elapsed_time=et, init_time=et)

    acts = 0.1 * jax.random.normal(jax.random.PRNGKey(5),
                                   (4, env.action_size))

    step_mega = jax.jit(jax.vmap(env.step))
    mega = env.engine.mega
    try:
        env.engine.mega = None
        step_old = jax.jit(jax.vmap(env.step))
        res_old = step_old(state, acts)
    finally:
        env.engine.mega = mega
    res_new = step_mega(state, acts)

    for name in ("base_pos", "base_quat", "q_rev", "w_rev"):
        np.testing.assert_allclose(
            np.asarray(getattr(res_new.state.sim, name)),
            np.asarray(getattr(res_old.state.sim, name)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res_new.state.ref_pos_offset),
        np.asarray(res_old.state.ref_pos_offset), atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_new.reward),
                               np.asarray(res_old.reward), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res_new.done),
                                  np.asarray(res_old.done))
    # the wrap actually happened for the first two envs
    assert np.all(np.asarray(res_new.state.elapsed_time[:2])
                  > env.motion.duration)


def test_megastep_links_env_path_matches_default(monkeypatch):
    """env.step with megastep_links (kernel-emitted link states; CPU
    fallback = link_states(fk(.))) must match the default epilogue path."""
    monkeypatch.setenv("PFPN_MEGASTEP_LINKS", "1")
    env = make("DeepMimicWalk-v0")
    assert env.engine.mega_links is not None

    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    st, _ = jax.jit(env.reset_batch)(keys)
    acts = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                   (2, env.action_size))
    res_new = jax.jit(jax.vmap(env.step))(st, acts)

    ml = env.engine.mega_links
    try:
        env.engine.mega_links = None
        res_old = jax.jit(jax.vmap(env.step))(st, acts)
    finally:
        env.engine.mega_links = ml

    np.testing.assert_allclose(np.asarray(res_new.obs),
                               np.asarray(res_old.obs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_new.reward),
                               np.asarray(res_old.reward), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_new.done),
                                  np.asarray(res_old.done))


def test_megastep_kernel_interpret_matches_primal(monkeypatch):
    """Both kernel variants (default and emit_links) against the
    scan-of-substeps primal; B=6 with a 4-lane tile exercises the
    PFPN_MEGASTEP_TILE override, the identity-state batch padding (pad=2),
    and a 2-step grid. The emit_links variant's link rows are checked
    against the XLA-side link_states(fk(.)) epilogue they replace."""
    from pfpn_tpu.ops import megastep as ms
    from pfpn_tpu.sim.dynamics import fk, link_states

    monkeypatch.setenv("PFPN_MEGASTEP_TILE", "4")

    env = _env()
    eng = env.engine
    meta = ms.build_meta(eng.tree, eng.gains, eng.config.contact,
                         eng.contact_set, eng.config.dt,
                         eng.config.frame_skip, eng.config.gravity)
    cmask = eng.contact_set.ancestor_mask

    B = 6
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    state, _ = jax.jit(env.reset_batch)(keys)
    sim = state.sim
    # perturb velocities so contacts/limits engage
    k1, k2 = jax.random.split(jax.random.PRNGKey(12))
    sim = sim.replace(
        base_lin=sim.base_lin + jnp.array([0.1, -0.4, 0.0]),
        w_sph=sim.w_sph + 0.3 * jax.random.normal(k1, sim.w_sph.shape),
        w_rev=sim.w_rev + 0.3 * jax.random.normal(k2, sim.w_rev.shape),
    )

    tgt_sph = jnp.zeros((B, meta.n_sph, 4)).at[:, :, 3].set(1.0)
    tgt_rev = jnp.zeros((B, meta.n_rev))

    def primal(st, ts, tr):
        def body(s, _):
            s2, act, _bp = eng._substep_fused_core_full(s, ts, tr)
            return s2, (act, s2.base_pos)
        st, (acts, hist) = jax.lax.scan(body, st, None,
                                        length=meta.frame_skip)
        return st, acts[-1], hist

    want_st, want_act, want_hist = jax.vmap(primal)(sim, tgt_sph, tgt_rev)

    st_mat = ms.pack_state(meta, sim)
    got_mat, got_act, got_hist, got_links = ms.megastep_pallas(
        meta, cmask, st_mat, tgt_sph.reshape(B, -1), tgt_rev,
        interpret=True, emit_links=True)
    got_st = ms.unpack_state(meta, got_mat, sim)

    np.testing.assert_allclose(np.asarray(got_st.base_pos),
                               np.asarray(want_st.base_pos), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_st.base_quat),
                               np.asarray(want_st.base_quat), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_st.q_sph),
                               np.asarray(want_st.q_sph), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_st.w_sph),
                               np.asarray(want_st.w_sph), atol=5e-3)
    np.testing.assert_allclose(np.asarray(got_st.q_rev),
                               np.asarray(want_st.q_rev), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_hist),
                               np.asarray(want_hist), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_act),
                                  np.asarray(want_act))
    # contacts actually engaged at some point
    assert np.asarray(want_act).sum() > 0

    # in-kernel link states == the epilogue they replace, on the SAME
    # final state (quats compared up to sign)
    ls_got = ms.links_to_states(meta, got_links)
    ls_want = jax.vmap(lambda s: link_states(eng.tree, fk(eng.tree, s)))(
        got_st)
    for f in ("frame_pos", "com_pos", "lin_vel", "ang_vel"):
        np.testing.assert_allclose(
            np.asarray(getattr(ls_got, f)),
            np.asarray(getattr(ls_want, f)), atol=5e-4, err_msg=f)
    for f in ("frame_quat", "com_quat"):
        g, w = np.asarray(getattr(ls_got, f)), np.asarray(getattr(ls_want, f))
        sign = np.where(np.sum(g * w, axis=-1, keepdims=True) < 0, -1.0, 1.0)
        np.testing.assert_allclose(g * sign, w, atol=5e-4, err_msg=f)

    # default (no-links) kernel variant: same outputs on the same inputs
    d_mat, d_act, d_hist = ms.megastep_pallas(
        meta, cmask, st_mat, tgt_sph.reshape(B, -1), tgt_rev,
        interpret=True)
    np.testing.assert_allclose(np.asarray(d_mat), np.asarray(got_mat),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_act), np.asarray(got_act))


def test_megastep_kernel_sublane_batch_matches_default(monkeypatch):
    """PFPN_MEGASTEP_SB>1 (sublane-batched layout, results/MFU.md lever)
    against the sb=1 kernel on a single substep at tight tolerance.

    One substep, not a full control step: the two layouts reduce the dof
    axis differently (sublane-axis reduce at sb=1, untiled-axis reduce at
    sb>1), so XLA's reduction associativity differs by ~1e-7 — over 20
    contact-rich substeps a knife-edge contact flips and chaos amplifies
    that to O(0.1) (observed), which no tolerance can meaningfully bound.
    A layout/logic bug (wrong row, bad block mapping) shows up at full
    magnitude in substep 1; fp reassociation measured ≤ 8e-5 absolute on
    one substep (14/1463 elements, velocity rows through the 34x34
    Gauss-Jordan inverse + 16 PGS iterations), hence the 2e-4 bound —
    the same scale the kernel-vs-primal test above tolerates.

    B=16 with tile=2 is a whole number of blocks for both sb=4 (blk 8,
    grid 2) and sb=8 (blk 16, grid 1) — required, because _resolve_sb
    deliberately falls back to sb=1 on non-block-multiple batches (so a
    non-multiple B would vacuously compare sb=1 to itself; the gate
    itself is asserted below). The emit_links rows are compared too."""
    import dataclasses as dc

    from pfpn_tpu.ops import megastep as ms

    env = _env()
    eng = env.engine
    meta = ms.build_meta(eng.tree, eng.gains, eng.config.contact,
                         eng.contact_set, eng.config.dt,
                         eng.config.frame_skip, eng.config.gravity)
    meta = dc.replace(meta, frame_skip=1)
    cmask = eng.contact_set.ancestor_mask

    # the divisibility gate: non-multiple batches fall back to lane-only
    assert ms._resolve_sb(4, 2, 16) == 4
    assert ms._resolve_sb(8, 2, 16) == 8
    assert ms._resolve_sb(4, 2, 19) == 1
    assert ms._resolve_sb(8, 128, 8192) == 8
    assert ms._resolve_sb(8, 128, 1365) == 1   # multi-task slice size
    assert ms._resolve_sb(1, 128, 77) == 1

    B = 16
    keys = jax.random.split(jax.random.PRNGKey(21), B)
    state, _ = jax.jit(env.reset_batch)(keys)
    sim = state.sim
    k1, k2 = jax.random.split(jax.random.PRNGKey(22))
    sim = sim.replace(
        base_lin=sim.base_lin + jnp.array([0.1, -0.4, 0.0]),
        w_sph=sim.w_sph + 0.3 * jax.random.normal(k1, sim.w_sph.shape),
        w_rev=sim.w_rev + 0.3 * jax.random.normal(k2, sim.w_rev.shape),
    )
    st_mat = ms.pack_state(meta, sim)
    tgt_sph = jnp.zeros((B, 4 * meta.n_sph)).at[:, 3::4].set(1.0)
    tgt_rev = jnp.zeros((B, meta.n_rev))

    monkeypatch.setenv("PFPN_MEGASTEP_TILE", "4")
    monkeypatch.delenv("PFPN_MEGASTEP_SB", raising=False)
    ref = ms.megastep_pallas(meta, cmask, st_mat, tgt_sph, tgt_rev,
                             interpret=True, emit_links=True)

    for sb in (4, 8):
        monkeypatch.setenv("PFPN_MEGASTEP_SB", str(sb))
        monkeypatch.setenv("PFPN_MEGASTEP_TILE", "2")
        got = ms.megastep_pallas(meta, cmask, st_mat, tgt_sph, tgt_rev,
                                 interpret=True, emit_links=True)
        for g, w, name in zip(got, ref, ("state", "act", "hist", "links")):
            np.testing.assert_allclose(
                np.asarray(g, dtype=np.float32),
                np.asarray(w, dtype=np.float32),
                atol=2e-4, err_msg=f"sb={sb} {name}")

#!/usr/bin/env python3
"""
Cross-engine consistency checker — the analog of the reference's
compare_backends.py (its de-facto test suite, reference
compare_backends.py:1-708).

The reference checks five numerical backends against each other; this
framework has ONE engine with three gate-application strategies plus the
golden reference checkpoints, so the checks become:

  1. QuanONet  dense ≡ gates ≡ pallas   forward + gradients
  2. HEAQNN    dense ≡ gates ≡ pallas   forward + gradients
  3. QuanONet  golden Antideriv .npz -> demo-accuracy reproduction
  4. QuanONet  golden Q5 .ckpt (Advection) loads and runs finitely
  5. FNN / DeepONet / FNO  forward + gradient sanity (finite, correct
     shapes, loss decreases over a few steps)
  6. ham_diag / ham_pauli measurement paths agree across engines

Tolerances follow the reference (compare_backends.py:26-31):
forward 1e-4 (quantum), gradients 1e-4; classical 1e-5.

Exit code 0 when every group passes, 1 otherwise.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FWD_TOL_QUANTUM = 1e-4
GRAD_TOL = 1e-4
FWD_TOL_CLASSICAL = 1e-5

RESULTS = []


def report(name, passed, detail=""):
    status = "PASS" if passed else "FAIL"
    print(f"[{status}] {name} {detail}")
    RESULTS.append((name, passed))


def _engines():
    import jax
    eng = ['dense', 'gates', 'fused']
    # pallas/embed run compiled on TPU and interpreted elsewhere (slow but
    # exact)
    eng.append('pallas')
    eng.append('embed')
    return eng


def test_quanonet_engines():
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec

    spec = quanonet_spec(4, (5, 2, 4, 1))
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (6, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(4, -5, 5))

    outs, grads = {}, {}
    for eng in _engines():
        outs[eng] = np.asarray(
            hea_expectation(spec, w, x, diag=diag, engine=eng))
        grads[eng] = np.asarray(jax.grad(
            lambda w_: jnp.sum(hea_expectation(spec, w_, x, diag=diag,
                                               engine=eng) ** 2))(w))
    ok = True
    for eng in _engines()[1:]:
        df = np.abs(outs[eng] - outs['dense']).max()
        dg = np.abs(grads[eng] - grads['dense']).max()
        ok &= df <= FWD_TOL_QUANTUM and dg <= GRAD_TOL
        report(f"QuanONet dense≡{eng}", df <= FWD_TOL_QUANTUM
               and dg <= GRAD_TOL, f"(fwd {df:.2e}, grad {dg:.2e})")
    return ok


def test_heaqnn_engines():
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    from quanonet_tpu.ops.hea import hea_expectation, heaqnn_spec

    spec = heaqnn_spec(3, (6, 2))
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (5, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(3, -5, 5))
    ok = True
    base = None
    for eng in _engines():
        out = np.asarray(hea_expectation(spec, w, x, diag=diag, engine=eng))
        g = np.asarray(jax.grad(
            lambda w_: jnp.sum(hea_expectation(spec, w_, x, diag=diag,
                                               engine=eng)))(w))
        if base is None:
            base = (out, g)
            continue
        df = np.abs(out - base[0]).max()
        dg = np.abs(g - base[1]).max()
        this_ok = df <= FWD_TOL_QUANTUM and dg <= GRAD_TOL
        ok &= this_ok
        report(f"HEAQNN dense≡{eng}", this_ok,
               f"(fwd {df:.2e}, grad {dg:.2e})")
    return ok


def test_ham_variants():
    import jax.numpy as jnp
    from quanonet_tpu.ops.hamiltonian import (
        generate_ham_diag_rank1, generate_ham_spectrum_uniform,
    )
    from quanonet_tpu.ops.hea import hea_expectation, heaqnn_spec

    spec = heaqnn_spec(3, (3, 1))
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1, 1,
                                (4, spec.total_encode)).astype(np.float32))
    ok = True
    for name, diag in [
            ('rank1', generate_ham_diag_rank1(3, seed=0)),
            ('uniform_rank4', generate_ham_spectrum_uniform(3, 4, seed=0))]:
        outs = [np.asarray(hea_expectation(spec, w, x,
                                           diag=jnp.asarray(
                                               diag.astype(np.float32)),
                                           engine=e))
                for e in ('dense', 'gates')]
        df = np.abs(outs[0] - outs[1]).max()
        ok &= df <= FWD_TOL_QUANTUM
        report(f"ham_diag[{name}] dense≡gates", df <= FWD_TOL_QUANTUM,
               f"(fwd {df:.2e})")
    # X/Y observables agree across engines
    for pauli in ('X', 'Y'):
        outs = [np.asarray(hea_expectation(spec, w, x, pauli=pauli,
                                           offset=0.0, coeff=1.0, engine=e))
                for e in ('dense', 'gates')]
        df = np.abs(outs[0] - outs[1]).max()
        ok &= df <= FWD_TOL_QUANTUM
        report(f"ham_pauli[{pauli}] dense≡gates", df <= FWD_TOL_QUANTUM,
               f"(fwd {df:.2e})")
    return ok


def test_golden_npz():
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.checkpoint import load_raw, quantum_params_from_raw
    from quanonet_tpu.models import QuanONet

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'pretrained_weights/Antideriv/'
        'Antideriv_QuanONet_Net5-1-5-1_Q2_TF_S0.001_1000x100_Seed0/'
        'best_model.npz')
    if not os.path.exists(path):
        report("golden Antideriv npz", True, "(skipped: not mounted)")
        return True
    raw = load_raw(path)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        quantum_params_from_raw(raw, 'QuanONet', (5, 1, 5, 1), 2, True))
    rng = np.random.RandomState(3)
    b = jnp.asarray(rng.randn(8, 10).astype(np.float32))
    t = jnp.asarray(rng.rand(8, 1).astype(np.float32))
    outs = []
    for eng in _engines():
        model = QuanONet(num_qubits=2, branch_input_size=10,
                         trunk_input_size=1, net_size=(5, 1, 5, 1),
                         scale_coeff=0.001, if_trainable_freq=True,
                         engine=eng)
        outs.append(np.asarray(model.apply(params, b, t)))
    df = max(np.abs(o - outs[0]).max() for o in outs[1:])
    report("golden Antideriv npz engines agree", df <= FWD_TOL_QUANTUM,
           f"(max diff {df:.2e})")
    return df <= FWD_TOL_QUANTUM


def test_golden_ckpt():
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.checkpoint import load_raw, quantum_params_from_raw
    from quanonet_tpu.models import QuanONet

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'pretrained_weights/Advection/'
        'Advection_QuanONet_Net40-2-20-2_Q5_TF_S0.1_1000x100_Seed0/'
        'best_model.ckpt')
    if not os.path.exists(path):
        report("golden Advection ckpt", True, "(skipped: not mounted)")
        return True
    raw = load_raw(path)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        quantum_params_from_raw(raw, 'QuanONet', (40, 2, 20, 2), 5, True))
    model = QuanONet(num_qubits=5, branch_input_size=100, trunk_input_size=2,
                     net_size=(40, 2, 20, 2), scale_coeff=0.1,
                     if_trainable_freq=True, engine='dense')
    rng = np.random.RandomState(4)
    out = np.asarray(model.apply(params,
                                 jnp.asarray(rng.randn(4, 100),
                                             dtype=jnp.float32),
                                 jnp.asarray(rng.rand(4, 2),
                                             dtype=jnp.float32)))
    ok = np.isfinite(out).all() and np.abs(out).max() < 10
    report("golden Advection ckpt loads+runs", bool(ok),
           f"(outputs {out.ravel()[:2]})")
    return ok


def test_pfused_engine():
    """pfused (ops/pallas_fused.py) only engages at Q>=8, above the
    shared Q3/Q4 cases — dedicated Q8 fwd+grad check vs the XLA fused
    engine.  On TPU this is the Mosaic gate for the fused-group chain
    kernel (multi-stage VJP, ring one-hot matmuls, cross-tile
    accumulation)."""
    import jax
    import jax.numpy as jnp
    from quanonet_tpu.ops.hamiltonian import simple_ham_diag
    from quanonet_tpu.ops.hea import hea_expectation, quanonet_spec

    spec = quanonet_spec(8, (4, 2, 3, 1))
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                spec.weight_shape()).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, 2,
                                (6, spec.total_encode)).astype(np.float32))
    diag = jnp.asarray(simple_ham_diag(8, -5, 5))

    def one(eng):
        out = np.asarray(hea_expectation(spec, w, x, diag=diag, engine=eng))
        g = np.asarray(jax.grad(
            lambda w_: jnp.sum(hea_expectation(spec, w_, x, diag=diag,
                                               engine=eng) ** 2))(w))
        return out, g

    o1, g1 = one('fused')
    o2, g2 = one('pfused')
    df = np.abs(o1 - o2).max()
    dg = np.abs(g1 - g2).max()
    ok = df <= FWD_TOL_QUANTUM and dg <= GRAD_TOL
    report("Q8 fused≡pfused", ok, f"(fwd {df:.2e}, grad {dg:.2e})")

    # multi-tile grid: force bt=8 so batch 6 pads to 8 and a batch-16
    # case spans 2 grid tiles — exercises the cross-tile cotangent
    # accumulation (revisited constant-index output blocks) ON HARDWARE,
    # which single-tile shapes never hit.
    import os as _os
    from quanonet_tpu.ops import pallas_fused as _pf
    x2 = jnp.asarray(rng.uniform(-2, 2,
                                 (16, spec.total_encode)).astype(np.float32))
    _os.environ['PFUSED_BT'] = '8'
    _pf._make_chain.cache_clear()
    try:
        def one2(eng):
            out = np.asarray(hea_expectation(spec, w, x2, diag=diag,
                                             engine=eng))
            g = np.asarray(jax.grad(
                lambda w_: jnp.sum(hea_expectation(spec, w_, x2, diag=diag,
                                                   engine=eng) ** 2))(w))
            return out, g
        o3, g3 = one2('fused')
        o4, g4 = one2('pfused')
    finally:
        del _os.environ['PFUSED_BT']
        _pf._make_chain.cache_clear()
    df2 = np.abs(o3 - o4).max()
    dg2 = np.abs(g3 - g4).max()
    ok2 = df2 <= FWD_TOL_QUANTUM and dg2 <= GRAD_TOL
    report("Q8 fused≡pfused (2-tile grid)", ok2,
           f"(fwd {df2:.2e}, grad {dg2:.2e})")

    # Q12 butterfly mode (hi=32): ⊗-factorized high group + class-
    # stacked ring + (n_sub, nh, 4) cotangent accumulation — the Mosaic
    # gate for the bfly layout ON HARDWARE (tiny net keeps the tunnel
    # compile bounded).
    spec12 = quanonet_spec(12, (2, 1, 1, 1))
    w12 = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                  spec12.weight_shape()).astype(np.float32))
    x12 = jnp.asarray(rng.uniform(-2, 2,
                                  (4, spec12.total_encode)).astype(np.float32))
    diag12 = jnp.asarray(simple_ham_diag(12, -5, 5))

    def one12(eng):
        out = np.asarray(hea_expectation(spec12, w12, x12, diag=diag12,
                                         engine=eng))
        g = np.asarray(jax.grad(
            lambda w_: jnp.sum(hea_expectation(spec12, w_, x12, diag=diag12,
                                               engine=eng) ** 2))(w12))
        return out, g

    o5, g5 = one12('fused')
    o6, g6 = one12('pfused')
    df3 = np.abs(o5 - o6).max()
    dg3 = np.abs(g5 - g6).max()
    ok3 = df3 <= FWD_TOL_QUANTUM and dg3 <= GRAD_TOL
    report("Q12 fused≡pfused (butterfly)", ok3,
           f"(fwd {df3:.2e}, grad {dg3:.2e})")

    # Q14 butterfly (hi=128, round 5): 7 high-qubit butterflies + bt=8
    # backward tiles — the Mosaic gate for the round-5 extension
    # (tiny 3-block net keeps the tunnel compile bounded).  TPU-only:
    # interpret-mode hi=128 costs ~10 min on the 1-core box (the same
    # workload tests/test_pallas_fused.py gates behind QON_SLOW).
    if jax.default_backend() != 'tpu':
        print("[SKIP] Q14 fused≡pfused (butterfly) — TPU-only gate "
              "(hi=128 interpret mode is ~10 min on CPU; run "
              "QON_SLOW=1 pytest tests/test_pallas_fused.py instead)")
        return ok and ok2 and ok3
    spec14 = quanonet_spec(14, (2, 1, 1, 1))
    w14 = jnp.asarray(rng.uniform(-np.pi, np.pi,
                                  spec14.weight_shape()).astype(np.float32))
    x14 = jnp.asarray(rng.uniform(-2, 2,
                                  (4, spec14.total_encode)).astype(np.float32))
    diag14 = jnp.asarray(simple_ham_diag(14, -5, 5))

    def one14(eng):
        out = np.asarray(hea_expectation(spec14, w14, x14, diag=diag14,
                                         engine=eng))
        g = np.asarray(jax.grad(
            lambda w_: jnp.sum(hea_expectation(spec14, w_, x14, diag=diag14,
                                               engine=eng) ** 2))(w14))
        return out, g

    o7, g7 = one14('fused')
    o8, g8 = one14('pfused')
    df4 = np.abs(o7 - o8).max()
    dg4 = np.abs(g7 - g8).max()
    ok4 = df4 <= FWD_TOL_QUANTUM and dg4 <= GRAD_TOL
    report("Q14 fused≡pfused (butterfly)", ok4,
           f"(fwd {df4:.2e}, grad {dg4:.2e})")
    return ok and ok2 and ok3 and ok4


def test_classical_models():
    import jax
    import jax.numpy as jnp
    import optax
    from quanonet_tpu.models import FNN, FNO, DeepONet, deeponet_layer_sizes

    rng = np.random.RandomState(5)
    ok = True

    # every classical family: a few SGD steps reduce the loss
    cases = []
    fnn = FNN(net_size=(2, 16))
    x = jnp.asarray(rng.randn(32, 8).astype(np.float32))
    y = jnp.asarray(rng.randn(32, 1).astype(np.float32))
    cases.append(('FNN', fnn, (x,), y))

    bl, tl = deeponet_layer_sizes([2, 16], 8, 1)
    don = DeepONet(branch_layers=bl, trunk_layers=tl)
    cases.append(('DeepONet', don,
                  (x, jnp.asarray(rng.rand(32, 1).astype(np.float32))), y))

    fno = FNO(modes=6, width=8, layers=1, fc_hidden=8)
    xg = jnp.asarray(rng.randn(8, 32, 2).astype(np.float32))
    yg = jnp.asarray(rng.randn(8, 32, 1).astype(np.float32))
    cases.append(('FNO', fno, (xg,), yg))

    for name, model, inputs, target in cases:
        params = model.init(jax.random.PRNGKey(0), *inputs)
        opt = optax.adam(1e-2)
        st = opt.init(params)

        def loss_fn(p):
            return jnp.mean((model.apply(p, *inputs) - target) ** 2)

        l0 = float(loss_fn(params))
        for _ in range(20):
            g = jax.grad(loss_fn)(params)
            upd, st = opt.update(g, st, params)
            params = optax.apply_updates(params, upd)
        l1 = float(loss_fn(params))
        this_ok = np.isfinite(l1) and l1 < l0
        ok &= this_ok
        report(f"{name} trains", this_ok, f"(loss {l0:.4f} -> {l1:.4f})")
    return ok


def main():
    # Consistency checks verify NUMERICS, so run matmuls at full f32
    # precision.  On TPU the default matmul precision is bf16, which the
    # perf path intentionally keeps (CLAUDE.md: f32 drops the headline
    # throughput 722K -> 483K samples/s) but which perturbs the engines
    # differently (the dense/pallas paths are matmul-heavy, the gates
    # path is matmul-free) by ~1e-2 — far above the 1e-4 contract.
    # The tunneled TPU can wedge (device enumeration hangs forever).
    # Probe it in a killable subprocess first; if unreachable, run the
    # gate on CPU (Pallas interpreted — still checks numerics, not
    # Mosaic) rather than hanging.  Same pattern as bench.py.
    if '--cpu' not in sys.argv and os.environ.get('JAX_PLATFORMS') == 'cpu':
        # The axon plugin IGNORES the JAX_PLATFORMS env var (CLAUDE.md) —
        # honor the user's stated intent via the config update below,
        # which is the forcing that actually works.
        sys.argv.append('--cpu')
    if '--cpu' not in sys.argv:
        import subprocess
        probe_s = int(os.environ.get('BENCH_TPU_PROBE_TIMEOUT', '300'))
        try:
            subprocess.run(
                [sys.executable, '-c', 'import jax; jax.devices()'],
                capture_output=True, timeout=probe_s, check=True)
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            print("TPU unreachable; running the consistency gate on CPU "
                  "(numerics only — Mosaic compile NOT exercised)")
            sys.argv.append('--cpu')

    import jax
    if '--cpu' in sys.argv:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_default_matmul_precision', 'highest')

    groups = [test_quanonet_engines, test_heaqnn_engines, test_ham_variants,
              test_golden_npz, test_golden_ckpt, test_classical_models,
              test_pfused_engine]
    all_ok = True
    for g in groups:
        try:
            all_ok &= bool(g())
        except Exception as e:
            report(g.__name__, False, f"(exception: {e})")
            all_ok = False
    n_pass = sum(1 for _, p in RESULTS if p)
    print(f"\n{'=' * 60}\n{n_pass}/{len(RESULTS)} checks passed")

    # Machine-readable artifact: when this runs on the real TPU backend it
    # is the Mosaic-compile regression gate for the Pallas kernels (the
    # pytest suite forces CPU, where Pallas runs interpreted — a
    # layout/VMEM regression would hide there).
    import jax
    import json
    artifact = {
        "platform": jax.devices()[0].platform,
        "passed": n_pass,
        "total": len(RESULTS),
        "all_ok": bool(all_ok),
        "checks": {name: bool(p) for name, p in RESULTS},
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'compare_engines_result.json')
    with open(out, 'w') as f:
        json.dump(artifact, f, indent=1)
    print(f"artifact: {out}")
    sys.exit(0 if all_ok else 1)


if __name__ == '__main__':
    main()

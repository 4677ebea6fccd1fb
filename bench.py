#!/usr/bin/env python3
"""
Benchmark: QuanONet Q5 Advection training samples/sec on one chip
(the driver-provided north-star metric, BASELINE.md).

Baseline: the reference's MindQuantum CPU path trains TF-QuanONet Q5 for
1000 epochs x 10,000 samples in ~80 min on a server-class CPU
(reference README.md:178) => ~2,083 samples/sec.  That anchor is for the
ODE net (Net20-2-10-2, 30 blocks); the Advection net benched here
(Net40-2-20-2, 60 blocks) is ~2x the work per sample, so using 2,083 as
the denominator UNDERSTATES the speedup — conservative in the
reference's favour.

Quality protocol (round 3):
* the quality number is the rel-L2 of the BEST-epoch parameters
  (tracked on device inside the jitted epoch loop, exactly as
  quanonet_tpu/solver.py does and as the reference's solver does,
  solver_ms.py:254-263) — round 2 evaluated final-epoch params, which
  is both stricter than the protocol it was compared against and
  noisier;
* the test set is the reference PDE regime's own (1000 test fns x 1000
  sampled points, reproduce_benchmarks1.sh:33) — the same data the
  sweep results and the anchor checkpoint were scored on;
* the ANCHOR is measured in-run: the reference's shipped Advection
  checkpoint (pretrained_weights/) is evaluated on the identical test
  set by the identical eval code, so "beats the reference" never
  depends on a stale hard-coded number;
* the full regime is trained --runs times, run r using the Solver's
  per-seed key protocol with seed=r (init and shuffle keys from
  PRNGKey(r)).  The JSON reports the per-run rel-L2 list plus
  mean/min/max; the headline "rel_l2" field is the WORST (max) run.
  (Measured round 3: identical program+keys replay bit-identically on
  this TPU — the run-to-run variance lives across seeds and across
  XLA recompilations, not across executions.)
* the default training recipe is adam + cosine decay from peak 3e-3
  (the solver's own lr_scheduler=cosine feature) — measured rel-L2
  0.085-0.087 over 3 seeds vs the in-run anchor's 0.169, at identical
  throughput.  --schedule none reproduces the reference's fixed
  adam(1e-4) recipe, whose band (0.1668-0.1750) straddles the anchor;
  the full LR sweep is in docs/BENCHMARKS.md (recipe study);
* --f32_tail N trains the LAST N epoch segments at matmul precision
  "highest" (bf16 body, f32 tail).  Measured round 3: this HURTS
  (0.1736-0.1867 vs 0.1668-0.1750 for the bf16+pins default; train MSE
  improves while test rel-L2 degrades) — the bf16-vs-f32 quality gap
  is a whole-trajectory effect, not late-stage refinement, so the
  default is 0 and the flag is kept as the documented experiment
  (docs/BENCHMARKS.md precision study).

Methodology notes (axon TPU tunnel):
* the first execution of a compiled program pays a large one-time
  server-side cost (~200s cold, ~15s with the persistent compilation
  cache under .jax_cache/) — excluded from the timed region;
* exactly ONE jitted program shape is used for all epochs, so the timed
  region never recompiles;
* jax.block_until_ready is not a reliable sync on the tunnel — the
  timed region materializes a dependent VALUE instead.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec", "vs_baseline": N}
Extra keys (rel_l2, rel_l2_runs, mfu_pct, ...) are informational.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 2083.0
REPO = os.path.dirname(os.path.abspath(__file__))
ANCHOR_CKPT = os.path.join(
    REPO, 'pretrained_weights/Advection',
    'Advection_QuanONet_Net40-2-20-2_Q5_TF_S0.1_1000x100_Seed0',
    'best_model.ckpt')
REFERENCE_ANCHOR_REL_L2 = 0.1697   # fallback if the ckpt is absent
#                                    (docs/BENCHMARKS.md)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def flops_per_sample(engine, n_qubits, n_blocks):
    """Model-FLOP cost per sample for one train step (fwd+bwd), by engine.

    dense / pallas (Karatsuba split-real chain): per block the forward is
    one complex (1,D)x(D,D) matmul = 3 real matmuls = 6D^2 FLOPs; the
    backward adds the mbar and sbar Karatsuba pairs = 12D^2.  Total
    18*D^2 per block.

    embed (real-embedding chain): forward is ONE real (1,2d)x(2d,2d)
    matmul = 2*(2d)^2 = 8D^2 FLOPs; backward is ebar = s^T g and
    sbar = g E^T, 8D^2 each.  Total 24*D^2 per block.

    fused / gates apply kron-factored operators (no per-block D x D
    matmul), so this dense-matmul model does not describe them; MFU is
    reported as null rather than wrong.
    """
    D = 2 ** n_qubits
    if engine in ('dense', 'pallas'):
        return 18 * D * D * n_blocks
    if engine == 'embed':
        return 24 * D * D * n_blocks
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--quick', action='store_true',
                    help='fewer epochs / smaller dataset')
    ap.add_argument('--regime', default='reference',
                    choices=['reference', 'throughput'],
                    help='reference (default): the reference paper\'s own '
                         'bs=100 training regime — best quality band, but '
                         'issue-bound (~100 us of every step is batch-'
                         'independent, docs/BENCHMARKS.md step anatomy).  '
                         'throughput: bs=1000 + linearly-scaled peak lr '
                         '1e-2 (measured batch-size frontier, docs/'
                         'batch_regime.json) — ~2.9x the samples/s and '
                         '~5x the MFU with every seed still beating the '
                         'anchor (rel-L2 0.106-0.110).  Each regime '
                         'refreshes its own docs/last_tpu_bench*.json '
                         'artifact on a default full run.')
    ap.add_argument('--cpu', action='store_true', help='force CPU backend')
    ap.add_argument('--engine', default='auto',
                    choices=['auto', 'dense', 'gates', 'fused', 'pallas',
                             'embed', 'pfused'])
    ap.add_argument('--epochs', type=int, default=None)
    ap.add_argument('--runs', type=int, default=None,
                    help='full training repeats for the rel-L2 spread '
                         '(default 3, 1 with --quick)')
    ap.add_argument('--precision', default=None,
                    choices=['default', 'float32', 'highest'],
                    help='jax default_matmul_precision for the WHOLE '
                         'program (bf16 MXU default if unset); the '
                         'quality/throughput trade is documented in '
                         'docs/BENCHMARKS.md')
    ap.add_argument('--lr', type=float, default=None,
                    help='peak learning rate (default: 3e-3 with cosine '
                         '— the measured plateau knee — and the reference '
                         'recipe\'s 1e-4 with --schedule none)')
    ap.add_argument('--schedule', default=None,
                    choices=['none', 'cosine'],
                    help='LR schedule (default cosine).  "none" = the '
                         'reference\'s fixed-lr adam recipe (its band '
                         'straddles the anchor: the 100-epoch regime is '
                         'undertrained, per-seed noise ±0.005).  '
                         '"cosine" = cosine decay to 0 from --lr (the '
                         'solver\'s own lr_scheduler=cosine feature) — '
                         'same data/epochs/model/engine, rel-L2 '
                         '0.085-0.087 vs the anchor\'s 0.169, 2x better '
                         'on every seed at identical throughput '
                         '(docs/BENCHMARKS.md recipe study).')
    ap.add_argument('--anchor_crossing', action='store_true',
                    help='evaluate test rel-L2 at every epoch-segment '
                         'boundary and report the first epoch at which '
                         'each run beats the in-run anchor score (the '
                         'time-to-matched-quality study).  Throughput is '
                         'then measured as the sum of per-segment device '
                         'times (evals excluded); the default mode is '
                         'untouched.')
    ap.add_argument('--batch_size', type=int, default=None,
                    help='override the reference regime\'s bs=100 (new '
                         'program shape).  ~100 us of every step is '
                         'batch-independent (docs/BENCHMARKS.md step '
                         'anatomy), so larger batches trade optimizer '
                         'steps for throughput; pair with --lr.')
    ap.add_argument('--datagen', default=None,
                    choices=['host', 'device', 'native'],
                    help='data-prep generator (see quanonet_tpu.config). '
                         'device/native are NOT byte-identical to the '
                         'reference cache, so this is never a headline '
                         'run; use to time device-side data prep.')
    ap.add_argument('--f32_tail', type=int, default=0,
                    help='run the LAST N epoch segments at matmul '
                         'precision "highest" (f32, 6-pass).  Default 0: '
                         'the measured effect is NEGATIVE (see module '
                         'docstring / docs/BENCHMARKS.md).')
    args = ap.parse_args()

    tpu_unreachable = False
    _is_child = os.environ.get('BENCH_CHILD') == '1'
    if not args.cpu and not _is_child:
        # The tunneled TPU can wedge (device enumeration hangs forever,
        # observed round 3).  Probe it in a killable subprocess before
        # committing this process to the axon backend; fall back to CPU
        # with an honest flag in the JSON rather than hanging the
        # driver.  3 x 300s covers the ~90s cold-start with margin.
        import subprocess
        probe_s = int(os.environ.get('BENCH_TPU_PROBE_TIMEOUT', '300'))
        for attempt in range(3):
            try:
                r = subprocess.run(
                    [sys.executable, '-c',
                     'import jax; print(jax.devices()[0].platform)'],
                    capture_output=True, text=True, timeout=probe_s)
                if r.returncode == 0:
                    break
            except subprocess.TimeoutExpired:
                pass
            log(f"TPU probe attempt {attempt + 1}/3 failed")
            time.sleep(min(30, probe_s))
        else:
            log("TPU unreachable after 3 probes; falling back to CPU "
                "(JSON will carry tpu_unreachable=true)")
            tpu_unreachable = True
            args.cpu = True

    if not args.cpu and not tpu_unreachable and not _is_child:
        # The probe only covers startup; the tunnel has also been
        # observed to wedge MID-RUN.  Run the real TPU benchmark in a
        # killable child with an overall deadline (BENCH_TPU_TOTAL_TIMEOUT,
        # default 2h — worst honest run is ~3 cold program compiles at
        # 13-18 min each plus ~1 min of training); on timeout or crash
        # fall back to CPU exactly like a failed probe instead of
        # hanging the driver.  The child skips the probe (just passed)
        # and this wrapper (BENCH_CHILD=1); its stderr streams through,
        # its stdout (the JSON line) is forwarded verbatim on success.
        import subprocess
        total_s = int(os.environ.get('BENCH_TPU_TOTAL_TIMEOUT', '7200'))
        env = dict(os.environ, BENCH_CHILD='1')
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, timeout=total_s, stdout=subprocess.PIPE, text=True)
            if r.returncode == 0 and r.stdout.strip():
                sys.stdout.write(r.stdout)
                return
            log(f"TPU bench child exited rc={r.returncode} without a "
                "result; falling back to CPU")
        except subprocess.TimeoutExpired:
            log(f"TPU bench child exceeded {total_s}s (mid-run tunnel "
                "wedge?); falling back to CPU")
        tpu_unreachable = True
        args.cpu = True

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    if args.precision and args.precision != 'default':
        jax.config.update('jax_default_matmul_precision', args.precision)
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import optax

    sys.path.insert(0, REPO)
    from quanonet_tpu.data.manager import DataManager
    from quanonet_tpu.models import QuanONet
    from quanonet_tpu.ops.hea import resolve_engine
    from quanonet_tpu.solver import make_run_segment, make_train_epoch

    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()}")

    # Reference Advection regime (scripts/reproduce_benchmarks1.sh:33 PDE
    # row): 1000 train fns x 100 pts/fn, bs=100, lr=1e-4, 100 epochs,
    # Q5 40-2-20-2; test = 1000 fns x 1000 sampled points (the same set
    # the sweep tables and the shipped anchor checkpoint are scored on).
    num_train = 200 if args.quick else 1000
    epochs = args.epochs or (10 if args.quick else 100)
    runs = args.runs or (1 if args.quick else 3)
    f32_tail = args.f32_tail
    if args.quick:
        cfg = dict(operator='Advection', model_type='QuanONet',
                   num_train=num_train, num_test=100,
                   num_points=100, num_points_0=100,
                   train_sample_num=100, test_sample_num=100)
    else:
        cfg = dict(operator='Advection', model_type='QuanONet',
                   num_train=num_train, num_test=1000,
                   num_points=100, num_points_0=100,
                   train_sample_num=100, test_sample_num=1000)
    if args.datagen:
        cfg['datagen'] = args.datagen
    t0 = time.time()
    np.random.seed(0)
    data = DataManager(cfg, data_dir=os.path.join(REPO, 'data')).get_data()
    log(f"data ready in {time.time() - t0:.1f}s; "
        f"train={data['train_output'].shape[0]} samples")

    model = QuanONet(num_qubits=5, branch_input_size=100, trunk_input_size=2,
                     net_size=(40, 2, 20, 2), scale_coeff=0.1,
                     if_trainable_freq=True, engine=args.engine)

    branch = jnp.asarray(data['train_branch_input'])
    trunk = jnp.asarray(data['train_trunk_input'])
    target = jnp.asarray(data['train_output'])
    inputs = (branch, trunk)
    n = target.shape[0]
    batch_size = args.batch_size or \
        (1000 if args.regime == 'throughput' else 100)
    if n % batch_size:
        raise SystemExit(f"--batch_size {batch_size} must divide the "
                         f"{n}-sample training set (one program shape)")

    # Optimizer recipe.  --schedule none reproduces the reference's fixed
    # adam(1e-4); the default is cosine decay from peak 3e-3 — the knee of
    # the measured LR plateau (docs/BENCHMARKS.md recipe study: monotone
    # improvement 2e-4..3e-3, plateau 0.084-0.09 through 1e-2; 3e-3 has
    # the tightest 3-seed spread).  Same data/epochs/model — the recipe is
    # the solver's own lr_scheduler=cosine feature (solver.py:135).
    schedule = args.schedule or 'cosine'
    # throughput regime: linear lr scaling with batch (measured better
    # than sqrt at bs=1000, docs/batch_regime.json)
    default_peak = (1e-2 if args.regime == 'throughput'
                    else 3e-3) if schedule == 'cosine' else 1e-4
    peak_lr = args.lr or default_peak
    steps_per_epoch = n // batch_size
    if schedule == 'cosine':
        lr = optax.cosine_decay_schedule(peak_lr, epochs * steps_per_epoch)
    else:
        lr = peak_lr
    optimizer = optax.adam(lr)

    # the solver's own primitives: jitted multi-epoch segments with
    # on-device best-param tracking (best-EPOCH eval, like the reference)
    train_epoch = make_train_epoch(model.apply, optimizer, n, batch_size,
                                   per_sample=1)
    run_segment = make_run_segment(train_epoch)

    seg = 5 if args.quick else 10
    assert epochs % seg == 0, "one program shape: seg must divide epochs"
    n_segs = epochs // seg

    # eval setup (forward-only; host-side chunking keeps the resident
    # footprint small — the full-regime test set is 1M rows)
    tb = np.asarray(data['test_branch_input'], np.float32)
    tt = np.asarray(data['test_trunk_input'], np.float32)
    ty = np.asarray(data['test_output'])
    fwd = jax.jit(lambda p, b, t: model.apply(p, b, t))
    chunk = 20000
    pad = (-tb.shape[0]) % chunk
    if pad:   # one compiled eval shape
        tb = np.concatenate([tb, tb[:pad]])
        tt = np.concatenate([tt, tt[:pad]])

    def eval_rel_l2(params):
        preds = np.concatenate([
            np.asarray(fwd(params, jnp.asarray(tb[s:s + chunk]),
                           jnp.asarray(tt[s:s + chunk])))
            for s in range(0, tb.shape[0], chunk)])[:ty.shape[0]]
        return float(np.linalg.norm(preds - ty)
                     / (np.linalg.norm(ty) + 1e-8))

    # measure the reference anchor on the IDENTICAL test set + eval code
    anchor_rel = None
    if os.path.exists(ANCHOR_CKPT):
        from quanonet_tpu.checkpoint import (
            load_raw, quantum_params_from_raw)
        araw = load_raw(ANCHOR_CKPT)
        aparams = jax.tree_util.tree_map(
            jnp.asarray,
            quantum_params_from_raw(araw, 'QuanONet', (40, 2, 20, 2), 5,
                                    True))
        anchor_rel = eval_rel_l2(aparams)
        log(f"reference shipped-ckpt anchor on this test set: "
            f"rel_l2 {anchor_rel:.4f}")
    anchor = anchor_rel if anchor_rel is not None \
        else REFERENCE_ANCHOR_REL_L2

    sps = None
    rels = []
    crossings = []   # --anchor_crossing: per-run [(epoch, rel_l2), ...]
    for run in range(runs):
        # the Solver's per-seed protocol (solver.py:269-272,337-339):
        # seed=run keys both the init and the epoch shuffles
        seed_key = jax.random.PRNGKey(run)
        params = model.init(seed_key, branch[:1], trunk[:1])
        all_keys = jax.random.split(seed_key, epochs)
        seg_keys = [all_keys[i * seg:(i + 1) * seg] for i in range(n_segs)]
        opt_state = optimizer.init(params)
        best_loss = jnp.asarray(np.inf, jnp.float32)
        best_params = params

        # warm-up segment (run 0 pays compile + program-load here)
        t0 = time.time()
        params, opt_state, best_loss, best_params, hist = run_segment(
            params, opt_state, best_loss, best_params, seg_keys[0],
            inputs, target)
        l0 = float(best_loss)   # value sync (block_until_ready unreliable)
        if run == 0:
            log(f"compile+first segment ({seg} epochs): "
                f"{time.time() - t0:.1f}s (best loss {l0:.4f})")

        if args.anchor_crossing:
            # time-to-matched-quality mode: eval test rel-L2 of the
            # best-so-far params at EVERY segment boundary; throughput =
            # sum of per-segment device times (evals excluded), same
            # program shape as the default mode
            track = [(seg, eval_rel_l2(best_params))]
            tsum = 0.0
            for i in range(1, n_segs):
                t0 = time.time()
                params, opt_state, best_loss, best_params, hist = \
                    run_segment(params, opt_state, best_loss, best_params,
                                seg_keys[i], inputs, target)
                _sync = float(best_loss)   # value sync before the eval
                tsum += time.time() - t0
                track.append(((i + 1) * seg, eval_rel_l2(best_params)))
            crossings.append(track)
            if run == 0 and n_segs > 1:
                sps = (epochs - seg) * n / tsum
                log(f"timed (per-segment sum): {epochs - seg} epochs x "
                    f"{n} samples in {tsum:.2f}s => {sps:,.0f} "
                    f"samples/sec")
            elif run == 0:
                # single-segment regime: the only real segment paid the
                # compile, so time a throwaway replay of the compiled
                # program from a fresh init (same trick as the default
                # mode) instead of leaving sps unset
                p2 = model.init(seed_key, branch[:1], trunk[:1])
                o2 = optimizer.init(p2)
                b2 = jnp.asarray(np.inf, jnp.float32)
                t0 = time.time()
                _p, _o, b2, _bp, _h = run_segment(p2, o2, b2, p2,
                                                  seg_keys[0], inputs,
                                                  target)
                _sync = float(b2)
                dt = time.time() - t0
                sps = seg * n / dt
                log(f"timed (single-segment replay): {seg} epochs x {n} "
                    f"samples in {dt:.2f}s => {sps:,.0f} samples/sec")
            first = next((e for e, r in track if r < anchor), None)
            log(f"run {run}: first epoch beating anchor "
                f"({anchor:.4f}): {first}; trajectory "
                + " ".join(f"{e}:{r:.4f}" for e, r in track))
            bl = float(best_loss)
            rel = eval_rel_l2(best_params)
            rels.append(rel)
            log(f"run {run}: best-epoch train MSE {bl:.6f} -> "
                f"test rel_l2 {rel:.4f}")
            continue

        # timed region (run 0 only): same program shape, zero recompiles
        timed_segs = min(n_segs - 1, 3)
        if timed_segs > 0:
            t0 = time.time()
            for i in range(1, 1 + timed_segs):
                params, opt_state, best_loss, best_params, hist = \
                    run_segment(params, opt_state, best_loss, best_params,
                                seg_keys[i], inputs, target)
            _sync = float(best_loss)
            dt = time.time() - t0
            timed_epochs = timed_segs * seg
        else:
            # single-segment regime (epochs == segment size): time a
            # throwaway replay of the already-compiled program from a
            # fresh init so the training trajectory stays exactly
            # `epochs` long
            p2 = model.init(seed_key, branch[:1], trunk[:1])
            o2 = optimizer.init(p2)
            b2 = jnp.asarray(np.inf, jnp.float32)
            t0 = time.time()
            _p, _o, b2, _bp, _h = run_segment(p2, o2, b2, p2, seg_keys[0],
                                              inputs, target)
            _sync = float(b2)
            dt = time.time() - t0
            timed_epochs = seg
        if run == 0:
            sps = timed_epochs * n / dt
            log(f"timed: {timed_epochs} epochs x {n} samples in "
                f"{dt:.2f}s => {sps:,.0f} samples/sec")

        # finish the regime; the last f32_tail segments retrace the SAME
        # segment program at matmul precision "highest" (a second cached
        # program shape) — bf16 gradient noise caps late-stage refinement
        # (see docs/BENCHMARKS.md precision study), so spending f32 only
        # on the tail buys the f32 quality band at bf16 throughput
        tail_start = max(1 + timed_segs, n_segs - f32_tail)
        for i in range(1 + timed_segs, n_segs):
            if i >= tail_start and f32_tail > 0:
                with jax.default_matmul_precision('highest'):
                    params, opt_state, best_loss, best_params, hist = \
                        run_segment(params, opt_state, best_loss,
                                    best_params, seg_keys[i], inputs,
                                    target)
            else:
                params, opt_state, best_loss, best_params, hist = \
                    run_segment(params, opt_state, best_loss, best_params,
                                seg_keys[i], inputs, target)
        bl = float(best_loss)
        rel = eval_rel_l2(best_params)
        rels.append(rel)
        log(f"run {run}: best-epoch train MSE {bl:.6f} -> "
            f"test rel_l2 {rel:.4f}")

    # per-engine model-FLOP accounting (batch-dependent matmul work only;
    # excludes the batch-independent block-unitary compilation, so this
    # is a lower bound)
    engine = resolve_engine(args.engine, 5)
    fps = flops_per_sample(engine, 5, n_blocks=40 + 20)
    V5E_PEAK_BF16 = 197e12
    if fps is not None:
        model_tflops = sps * fps / 1e12
        mfu = model_tflops / (V5E_PEAK_BF16 / 1e12)
        log(f"model FLOPs ({engine}): {fps / 1e6:.2f} MFLOP/sample "
            f"=> {model_tflops:.3f} TFLOP/s, MFU {mfu * 100:.3f}% "
            f"(v5e bf16 peak {V5E_PEAK_BF16 / 1e12:.0f} TFLOP/s)")
    else:
        model_tflops = mfu = None
        log(f"model FLOPs: no dense-matmul model for engine '{engine}'; "
            f"MFU not reported")

    rel_worst = max(rels)
    log(f"rel_l2 over {runs} run(s): mean {np.mean(rels):.4f} "
        f"min {min(rels):.4f} max {rel_worst:.4f} "
        f"(measured anchor {anchor:.4f}; "
        f"worst-run beats anchor: {rel_worst < anchor})")

    result = {
        "metric": "quanonet_q5_advection_train_samples_per_sec_per_chip",
        "regime": args.regime,
        "value": round(sps, 1),
        "unit": "samples/sec",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 2),
        "rel_l2": round(rel_worst, 4),
        "rel_l2_runs": [round(r, 4) for r in rels],
        "rel_l2_mean": round(float(np.mean(rels)), 4),
        "rel_l2_min": round(min(rels), 4),
        "rel_l2_max": round(rel_worst, 4),
        "eval_protocol": "best-epoch, per-seed keys, worst of runs",
        "reference_anchor_rel_l2": round(anchor, 4),
        "anchor_measured_in_run": anchor_rel is not None,
        "beats_anchor_all_runs": bool(rel_worst < anchor),
        "epochs": epochs,
        "runs": runs,
        "batch_size": batch_size,
        "engine": args.engine,
        "resolved_engine": engine,
        "lr": peak_lr,
        "lr_schedule": schedule,
        "matmul_precision": args.precision or 'default',
        "f32_tail_segs": f32_tail,
        "platform": platform,
        **({"tpu_unreachable": True} if tpu_unreachable else {}),
        **({"anchor_crossing_runs":
                [[[e, round(r, 4)] for e, r in t] for t in crossings],
            "epochs_to_anchor":
                [next((e for e, r in t if r < anchor), None)
                 for t in crossings]}
           if args.anchor_crossing else {}),
        "model_tflops_per_sec": (round(model_tflops, 4)
                                 if model_tflops is not None else None),
        "mfu_pct": round(mfu * 100, 4) if mfu is not None else None,
    }
    # Persist each genuine-TPU result so a later wedged-tunnel fallback
    # run can still surface the last measured hardware numbers (clearly
    # labeled — the top-level fields stay honest about the CPU fallback).
    last_tpu_path = os.path.join(
        REPO, 'docs',
        'last_tpu_bench.json' if args.regime == 'reference'
        else f'last_tpu_bench_{args.regime}.json')
    # ... but only the SHIPPED-DEFAULT full run of each regime may
    # refresh its artifact: a --quick smoke or an experiment variant
    # (custom epochs/recipe/precision/engine, A/B env knobs) must not
    # clobber what the fallback will later present as the headline.
    # The guard is DERIVED from the argparse defaults so any future flag
    # defaults to "not a headline run" unless explicitly allowlisted.
    _benign_flags = {'regime'}   # selects WHICH artifact, never taints it
    _ap_defaults = {a.dest: a.default for a in ap._actions
                    if a.dest != 'help'}
    _overridden = sorted(
        k for k, v in vars(args).items()
        if k not in _benign_flags and v != _ap_defaults.get(k, v))
    if _overridden:
        log(f"non-default flags {_overridden}: artifact refresh skipped")
    _is_default_run = (not _overridden
                       and os.environ.get('QON_UNPIN_EXPECT') != '1'
                       and os.environ.get('FUSED_UNROLL') is None)
    if platform == 'tpu' and not tpu_unreachable and _is_default_run:
        try:
            tmp = last_tpu_path + '.tmp'
            with open(tmp, 'w') as f:
                json.dump(dict(result, recorded_unix=time.time()), f)
            os.replace(tmp, last_tpu_path)
        except OSError as e:
            log(f"could not persist last-TPU result: {e}")
    elif tpu_unreachable and os.path.exists(last_tpu_path):
        try:
            with open(last_tpu_path) as f:
                result["last_tpu_result"] = json.load(f)
        except (OSError, ValueError) as e:
            log(f"could not read last-TPU result: {e}")
    print(json.dumps(result))


if __name__ == '__main__':
    main()

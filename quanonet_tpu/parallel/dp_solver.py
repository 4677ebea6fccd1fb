"""
SPMD data-parallel training segments for the Solver (--num_devices N).

Each device holds a 1/N shard of the training set; every optimizer step
differentiates the LOCAL unreduced squared-error sum, then ALL-REDUCES
the per-shard gradient pieces with an explicit psum and normalizes by
the psum'd sample count.  Both the placement and the normalization are
load-bearing: (a) without the gradient psum every replica would apply
only its own shard's piece and the "replicated" parameters silently
drift apart (round-3 bug, caught by the elastic-resume bit-identity
test); (b) differentiating a psum'd loss instead seeds a unit cotangent
on every device and psum's transpose is psum, so each local grad comes
out n_dev x its piece — psum'ing those over-counts the full-batch
gradient by n_dev (round-3/4 latent bug, invisible under Adam's scale
invariance, caught by the round-5 SGD exactness test).  With the local-
sum construction, updates are the exact full-batch gradient independent
of psum-transpose semantics, and replicas stay bit-identical across
devices (asserted in tests/test_parallel.py).
Shuffling is per-device over the local shard ("local shuffling" — the
standard DP relaxation of global shuffling; the composition of
minibatches differs from single-device training but each sample is still
visited exactly once per epoch).

Built on the same epoch/segment shape as quanonet_tpu/solver.py so the
Solver can swap it in transparently; validated against the single-device
path on the virtual 8-device CPU mesh in tests/test_parallel.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def pad_to_devices(arrays, outputs, n_devices):
    """Pad the sample axis so it divides evenly across devices; returns
    (arrays, outputs, global_real_n).  Padded rows are masked out of the
    loss by the per-shard real-count bookkeeping."""
    n = outputs.shape[0]
    pad = (-n) % n_devices
    if pad:
        arrays = tuple(np.concatenate([a, a[:pad]]) for a in arrays)
        outputs = np.concatenate([outputs, outputs[:pad]])
    return arrays, outputs, n


def make_dp_run_segment(model_apply, optimizer, mesh, global_n, batch_size,
                        per_sample, rng_collection=None):
    """Returns (run_segment, shard_data) where run_segment has the same
    signature/semantics as solver.make_run_segment but executes SPMD over
    the mesh's 'data' axis.

    rng_collection: thread a fresh per-step flax rng under this collection
    name (noise-aware training, ops/noise.py — each device resamples its
    OWN Pauli trajectories per optimizer step, folded from the epoch key
    by device index, so the composed estimator is an independent-
    trajectory average over the global batch; stochastic-gradient
    semantics identical in distribution to the single-device noisy path).
    The default path is byte-identical to before the parameter existed."""
    n_devices = mesh.shape['data']
    if batch_size % n_devices:
        raise ValueError(f"batch_size {batch_size} must divide evenly "
                         f"across {n_devices} devices")
    local_bs = batch_size // n_devices
    padded_n = global_n + ((-global_n) % n_devices)
    local_n = padded_n // n_devices
    num_batches = max(1, int(np.ceil(local_n / local_bs)))
    local_padded = num_batches * local_bs
    stochastic = bool(rng_collection)

    def local_epoch(carry, key, inputs, outputs, real_mask):
        """Runs per device inside shard_map.  real_mask: (local_n,) 1.0
        for genuine samples, 0.0 for device-padding rows."""
        params, opt_state = carry
        me = jax.lax.axis_index('data')
        key = jax.random.fold_in(key, me)
        if stochastic:
            key, knoise = jax.random.split(key)
            step_rngs = jax.random.split(knoise, num_batches)
        perm = jax.random.permutation(key, local_n)
        pad_idx = jnp.concatenate([perm, perm[:local_padded - local_n]])
        wrap_mask = (jnp.arange(local_padded) < local_n).astype(jnp.float32)
        idx = pad_idx.reshape(num_batches, local_bs)
        masks = wrap_mask.reshape(num_batches, local_bs)

        def batch_loss(p, batch_in, batch_out, mask, rng):
            """LOCAL masked squared-error SUM — deliberately unreduced.

            Differentiating a psum'd loss inside shard_map is a trap:
            the replicated loss output seeds a cotangent of 1 on EVERY
            device and psum's transpose is psum, so each device's grad
            comes out n_dev x its local piece — psum'ing those over-
            counts the full-batch gradient by n_dev (a real bug shipped
            in rounds 3-4, invisible under Adam's scale invariance,
            caught by the round-5 SGD exactness test below).  Instead
            the grad is taken of the LOCAL sum only; step() psums the
            per-shard grad pieces and divides by the global count —
            exact by construction, independent of transpose semantics."""
            if rng is None:
                pred = model_apply(p, *batch_in)
            else:
                pred = model_apply(p, *batch_in,
                                   rngs={rng_collection: rng})
            m = mask.reshape(mask.shape + (1,) * (pred.ndim - 1))
            return jnp.sum((pred - batch_out) ** 2 * m)

        def step(carry, b):
            params, opt_state = carry
            if stochastic:
                bi, bm, rng = b
            else:
                (bi, bm), rng = b, None
            batch_in = tuple(a[bi] for a in inputs)
            batch_out = outputs[bi]
            bm = bm * real_mask[bi]     # mask device-padding rows too
            sq_local, grads = jax.value_and_grad(batch_loss)(
                params, batch_in, batch_out, bm, rng)
            cnt = jax.lax.psum(jnp.sum(bm), 'data')
            denom = jnp.maximum(cnt * per_sample, 1.0)
            loss = jax.lax.psum(sq_local, 'data') / denom
            # exact full-batch gradient: sum of the per-shard pieces of
            # the UNREDUCED local sums, normalized by the global count
            # (see batch_loss docstring for why the psum sits here)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, 'data') / denom, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, cnt)

        xs = (idx, masks, step_rngs) if stochastic else (idx, masks)
        (params, opt_state), (losses, counts) = jax.lax.scan(
            step, (params, opt_state), xs)
        avg_loss = jnp.mean(losses)
        sse = jnp.sum(losses * counts * per_sample)
        return (params, opt_state), (avg_loss, sse)

    def segment_body(params, opt_state, best_loss, best_params, keys,
                     inputs, outputs, real_mask):
        def epoch_step(carry, key):
            params, opt_state, best_loss, best_params = carry
            (params, opt_state), (avg_loss, sse) = local_epoch(
                (params, opt_state), key, inputs, outputs, real_mask)
            improved = avg_loss < best_loss
            best_loss = jnp.where(improved, avg_loss, best_loss)
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(improved, p, b), best_params, params)
            return (params, opt_state, best_loss, best_params), \
                (avg_loss, sse)
        (params, opt_state, best_loss, best_params), hist = jax.lax.scan(
            epoch_step, (params, opt_state, best_loss, best_params), keys)
        return params, opt_state, best_loss, best_params, hist

    sharded = shard_map(
        segment_body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P('data'), P('data'), P('data')),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False)
    jitted = jax.jit(sharded)

    def run_segment(params, opt_state, best_loss, best_params, keys,
                    inputs, outputs):
        return jitted(params, opt_state, best_loss, best_params, keys,
                      inputs, outputs, run_segment.real_mask)

    def shard_data(arrays, outputs_np):
        arrays, outputs_np, real_n = pad_to_devices(arrays, outputs_np,
                                                    n_devices)
        sh = NamedSharding(mesh, P('data'))
        inputs_dev = tuple(jax.device_put(jnp.asarray(a), sh)
                           for a in arrays)
        outputs_dev = jax.device_put(jnp.asarray(outputs_np), sh)
        mask = (np.arange(padded_n) < real_n).astype(np.float32)
        run_segment.real_mask = jax.device_put(jnp.asarray(mask), sh)
        return inputs_dev, outputs_dev

    return run_segment, shard_data

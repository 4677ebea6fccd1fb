"""
Solver/CLI integration of the sharded circuit engines (``--shard amp|pipe``).

The amplitude-sharded engine (parallel/amplitude.py) and the pipeline-
parallel engine (parallel/pipeline.py) evaluate the SAME HEA expectation
contract as the single-device engines — f(weights, x, diag) -> (batch, 1)
— but execute it shard_map'd over a device mesh.  This module makes them
reachable as model engines ('amp' / 'pipe' in ops/hea.hea_expectation):
the Solver establishes a process-wide shard context (mesh + schedule
knobs) before building the model, and every expectation the model takes
— training loss, eval forward, init trace — routes through the sharded
program.  ``main.py --num_qubits 12 --shard amp --num_devices 8`` then
trains a Q12 model with its 4096-amplitude state split across 8 chips,
end to end, with no other code aware of the sharding.

The reference has no distributed execution at all (SURVEY.md §5.7/5.8:
absent); this is new capability.  Validated vs the single-device engines
in tests/test_parallel.py (Solver-level) and tests/test_amplitude_sharding
/ test_pipeline.py (engine-level).
"""
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

SHARD_MODES = ('amp', 'pipe')


@dataclass(frozen=True)
class ShardContext:
    mesh: object                       # jax.sharding.Mesh, axis named `mode`
    mode: str                          # 'amp' | 'pipe'
    n_microbatches: Optional[int] = None   # pipe only (default: pipe size)


_context: Optional[ShardContext] = None
_fn_cache = {}


def set_shard_context(mesh, mode, n_microbatches=None):
    """Install the process-wide shard context.  ``mesh`` must have a
    single axis named exactly ``mode``."""
    global _context
    if mode not in SHARD_MODES:
        raise ValueError(f"shard mode must be one of {SHARD_MODES}, "
                         f"got '{mode}'")
    if mode not in mesh.axis_names:
        raise ValueError(f"mesh axes {mesh.axis_names} lack the '{mode}' "
                         f"axis the {mode}-sharded engine runs over")
    _context = ShardContext(mesh, mode,
                            int(n_microbatches) if n_microbatches else None)
    return _context


def clear_shard_context():
    global _context
    _context = None
    _fn_cache.clear()


def get_shard_context() -> Optional[ShardContext]:
    return _context


def _build(spec, ctx, pauli='Z', offset=0.0, coeff=0.0):
    if ctx.mode == 'amp':
        from quanonet_tpu.parallel.amplitude import make_sharded_hea
        # grouped-kron MXU local path where the spec allows it (uniform
        # encode — true for every QuanONet/HEAQNN net); per-gate fallback
        # otherwise
        return make_sharded_hea(spec, ctx.mesh, axis='amp',
                                fused=spec.uniform_encode,
                                pauli=pauli, offset=offset, coeff=coeff)
    from quanonet_tpu.parallel.pipeline import make_pipeline_hea
    raw = make_pipeline_hea(spec, ctx.mesh, axis='pipe',
                            n_microbatches=ctx.n_microbatches,
                            pauli=pauli, offset=offset, coeff=coeff)
    M = int(ctx.n_microbatches or ctx.mesh.shape['pipe'])

    def fn(weights, x, diag):
        # the GPipe schedule needs batch % n_microbatches == 0; pad with
        # zero rows (static shape per trace) and slice the results away —
        # the slice's transpose zeroes the pad rows' cotangents, so
        # gradients are untouched
        batch = x.shape[0]
        pad = (-batch) % M
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
        return raw(weights, x, diag)[:batch]

    return fn


def sharded_expectation(spec, weights, x, diag, pauli='Z', offset=0.0,
                        coeff=0.0):
    """Engine entry point used by ops/hea.hea_expectation for the 'amp'
    and 'pipe' engines.  Builds (and caches) the shard_map'd program for
    (spec, context, observable) on first use.  For pauli='X'/'Y' the
    observable is ⟨offset + coeff·Σᵢ Pᵢ⟩ and ``diag`` may be None."""
    ctx = _context
    if ctx is None:
        raise RuntimeError(
            "engine 'amp'/'pipe' needs an active shard context — "
            "run via Solver --shard amp|pipe, or call "
            "parallel.shard_engine.set_shard_context(mesh, mode) first")
    try:
        offset, coeff = float(offset), float(coeff)
    except TypeError as e:
        raise ValueError(
            "engine 'amp'/'pipe' bakes the observable into the "
            "shard_map program: pauli offset/coeff must be concrete "
            "Python floats, not traced values (use a single-device "
            "engine to differentiate w.r.t. Hamiltonian bounds)") from e
    key = (spec, ctx.mode, ctx.mesh, ctx.n_microbatches,
           pauli, offset, coeff)
    fn = _fn_cache.get(key)
    if fn is None:
        fn = _fn_cache[key] = _build(spec, ctx, pauli, offset, coeff)
    if diag is None:
        import numpy as np
        diag = np.zeros(spec.dim, np.float32)
    return fn(weights, x, jnp.asarray(diag, jnp.float32))


def validate_shard_config(mode, n_devices, spec, batch_size=None,
                          n_microbatches=None):
    """Friendly upfront checks for the Solver (the engines raise the same
    conditions later, but deep inside a trace)."""
    if mode == 'amp':
        if n_devices & (n_devices - 1):
            raise ValueError(
                f"--shard amp needs a power-of-two --num_devices, "
                f"got {n_devices}")
        k = n_devices.bit_length() - 1
        if k > spec.n_qubits:
            raise ValueError(
                f"--shard amp: 2^{k} shards ({n_devices} devices) exceed "
                f"the 2^{spec.n_qubits} amplitudes of a Q{spec.n_qubits} "
                f"state")
    elif mode == 'pipe':
        if spec.n_blocks % n_devices:
            raise ValueError(
                f"--shard pipe: n_blocks={spec.n_blocks} (branch_depth + "
                f"trunk_depth) must divide evenly over {n_devices} "
                f"pipeline stages")
        M = int(n_microbatches or n_devices)
        if batch_size is not None and batch_size % M:
            raise ValueError(
                f"--shard pipe: batch_size={batch_size} not divisible by "
                f"n_microbatches={M} (batches are zero-padded at "
                f"inference, but training batches should divide evenly "
                f"to avoid wasted pipeline ticks)")

"""
QuanONet and HEAQNN Flax modules.

Architecture contract (SURVEY.md §2b; reference core/models_ms.py:37-124,
core/models_pt.py:103-213):

QuanONet:
    branch u0 -> freq map -> branch_enc (branch_depth * nq angles)
    trunk  y  -> freq map -> trunk_enc  (trunk_depth * nq angles)
    x = concat([trunk_enc, branch_enc])          # trunk first!
    out = <H>_HEA(x) + bias                      # scalar trainable bias

HEAQNN (ablation twin): single input stream, same blocks, no bias.

Parameter tree is laid out so the reference's .npz checkpoint keys map
1:1 (quanonet_tpu/checkpoint.py):
    ansatz (S,3,nq)      <-> 'QuanONet.weight' / 'HEAQNN.weight' flat
    bias ()              <-> 'bias'
    branch_freq/{weights,bias} <-> 'branch_LinearLayer.Net2.{weights,bias}'
    trunk_freq/{weights,bias}  <-> 'trunk_LinearLayer.Net2.{weights,bias}'
    freq/{weights,bias}        <-> 'LinearLayer.Net2.{weights,bias}'
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from quanonet_tpu.models.layers import FixedScale, TrainableFreq
from quanonet_tpu.ops.hamiltonian import resolve_ham_diag, simple_ham_params
from quanonet_tpu.ops.hea import (
    hea_expectation, heaqnn_spec, init_ansatz_weights, quanonet_spec,
)


def _measure(spec, ansatz, x, ham_bound, ham_diag, ham_pauli, engine,
             shots=None, shot_key=None,
             noise_p=None, noise_traj=32, readout_p=0.0, noise_key=None,
             zne_scales=None, damp_gamma=None, dephase_p=None,
             grad_method='autodiff', ps_chunk=None):
    decohere = damp_gamma is not None or dephase_p is not None
    noisy = noise_p is not None or readout_p or decohere
    if grad_method == 'shift':
        # hardware-compatible gradients (ops/param_shift.py): the
        # expectation's VJP is the exact two-point shift rule for the
        # ansatz AND the encode inputs — with shots, each shifted
        # evaluation is finite-shot sampled, so the model TRAINS under
        # QPU-style readout (autodiff cannot differentiate multinomial)
        if noisy or zne_scales:
            raise ValueError(
                "grad_method='shift' assumes a unitary circuit; drop the "
                "noise/zne flags (noise-aware training uses autodiff)")
        from quanonet_tpu.ops.param_shift import make_ps_expectation
        if ham_pauli == 'Z' or ham_diag is not None:
            kw = dict(diag=jnp.asarray(resolve_ham_diag(
                spec.n_qubits, list(ham_bound),
                list(ham_diag) if ham_diag is not None else None)))
        else:
            offset, coeff = simple_ham_params(
                spec.n_qubits, ham_bound[0], ham_bound[1])
            kw = dict(pauli=ham_pauli, offset=offset, coeff=coeff)
        f = make_ps_expectation(spec, engine=engine, shots=shots,
                                chunk=ps_chunk, **kw)
        return f(ansatz, x, shot_key) if shots else f(ansatz, x)
    if zne_scales:
        # zero-noise extrapolation (ops/mitigation.py): CRN trajectories
        # evaluate every scale in one program; replaces the plain noisy path
        if not noise_p:
            raise ValueError("zne_scales requires noise_p > 0")
        if shots:
            raise ValueError("zne_scales and shots are mutually exclusive "
                             "(extrapolate exact trajectory expectations)")
        if decohere:
            raise ValueError("zne_scales extrapolates the depolarizing "
                             "channel only; drop damp_gamma/dephase_p")
        from quanonet_tpu.ops.mitigation import zne_expectation
    elif noisy:
        from quanonet_tpu.ops.noise import noisy_expectation
    elif shots:
        from quanonet_tpu.ops.sampling import shot_expectation
    if ham_pauli == 'Z' or ham_diag is not None:
        diag = jnp.asarray(
            resolve_ham_diag(spec.n_qubits, list(ham_bound),
                             list(ham_diag) if ham_diag is not None else None))
        if zne_scales:
            return zne_expectation(noise_key, spec, ansatz, x, noise_p,
                                   noise_traj, scales=tuple(zne_scales),
                                   diag=diag, readout_p=readout_p)
        if noisy:
            return noisy_expectation(noise_key, spec, ansatz, x,
                                     noise_p if noise_p is not None else 0.0,
                                     noise_traj, diag=diag, shots=shots,
                                     readout_p=readout_p,
                                     damp_gamma=damp_gamma,
                                     dephase_p=dephase_p)
        if shots:
            return shot_expectation(shot_key, spec, ansatz, x, shots,
                                    diag=diag, engine=engine)
        return hea_expectation(spec, ansatz, x, diag=diag, engine=engine)
    offset, coeff = simple_ham_params(spec.n_qubits, ham_bound[0], ham_bound[1])
    if zne_scales:
        return zne_expectation(noise_key, spec, ansatz, x, noise_p,
                               noise_traj, scales=tuple(zne_scales),
                               pauli=ham_pauli, offset=offset, coeff=coeff,
                               readout_p=readout_p)
    if noisy:
        return noisy_expectation(noise_key, spec, ansatz, x,
                                 noise_p if noise_p is not None else 0.0,
                                 noise_traj, pauli=ham_pauli, offset=offset,
                                 coeff=coeff, shots=shots,
                                 readout_p=readout_p,
                                 damp_gamma=damp_gamma, dephase_p=dephase_p)
    if shots:
        return shot_expectation(shot_key, spec, ansatz, x, shots,
                                pauli=ham_pauli, offset=offset, coeff=coeff,
                                engine=engine)
    return hea_expectation(spec, ansatz, x, pauli=ham_pauli,
                           offset=offset, coeff=coeff, engine=engine)


class QuanONet(nn.Module):
    """Quantum operator network (reference core/models_ms.py:37-89)."""
    num_qubits: int
    branch_input_size: int
    trunk_input_size: int
    net_size: Tuple[int, int, int, int]  # (bd, bld, td, tld)
    scale_coeff: float = 0.01
    if_trainable_freq: bool = True
    ham_bound: Tuple[float, float] = (-5.0, 5.0)
    ham_diag: Optional[Tuple[float, ...]] = None
    ham_pauli: str = 'Z'
    engine: str = 'auto'
    # Finite-shot measurement (QPU emulation, ops/sampling.py).  When set,
    # apply() needs an rng: model.apply(params, b, t, rngs={'shots': key}).
    shots: Optional[int] = None
    # Pauli-twirled noise trajectories (QPU noise emulation, ops/noise.py).
    # When noise_p/readout_p set, apply() needs rngs={'noise': key};
    # shots then rides the noise path (one noise realization per shot).
    noise_p: Optional[float] = None
    noise_traj: int = 32
    readout_p: float = 0.0
    # Zero-noise extrapolation (ops/mitigation.py): Richardson scales,
    # e.g. (1., 2., 3.); needs noise_p. Mutually exclusive with shots.
    zne_scales: Optional[Tuple[float, ...]] = None
    # T1/T2 decoherence per block (ops/noise.py MCWF trajectories):
    # damp_gamma = 1 − e^(−t_block/T1), dephase_p = Z-flip prob from Tφ;
    # derive both from calibration via channel_params_from_t1t2.
    damp_gamma: Optional[float] = None
    dephase_p: Optional[float] = None
    # 'autodiff' (default) or 'shift': hardware-compatible shift-rule
    # gradients (ops/param_shift.py); composes with `shots` for genuine
    # finite-shot training.  ps_chunk bounds the shift fan-out per step.
    grad_method: str = 'autodiff'
    ps_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, branch_input, trunk_input):
        bd, bld, td, tld = self.net_size
        spec = quanonet_spec(self.num_qubits, self.net_size)

        if self.if_trainable_freq:
            branch_enc = TrainableFreq(bd * self.num_qubits,
                                       self.scale_coeff,
                                       name='branch_freq')(branch_input)
            trunk_enc = TrainableFreq(td * self.num_qubits,
                                      self.scale_coeff,
                                      name='trunk_freq')(trunk_input)
        else:
            branch_enc = FixedScale(bd * self.num_qubits,
                                    self.scale_coeff)(branch_input)
            trunk_enc = FixedScale(td * self.num_qubits,
                                   self.scale_coeff)(trunk_input)

        # trunk encoding first: the circuit is trunk blocks then branch
        # blocks (reference core/models_ms.py:87, models_pt.py:164)
        x = jnp.concatenate([trunk_enc, branch_enc], axis=1)

        ansatz = self.param(
            'ansatz',
            lambda key, _: init_ansatz_weights(key, spec),
            spec.weight_shape())
        bias = self.param('bias', nn.initializers.zeros, ())
        noisy = (self.noise_p is not None or self.readout_p
                 or self.damp_gamma is not None
                 or self.dephase_p is not None)
        shot_key = self.make_rng('shots') if (self.shots and not noisy) \
            else None
        noise_key = self.make_rng('noise') if noisy else None
        out = _measure(spec, ansatz, x, self.ham_bound, self.ham_diag,
                       self.ham_pauli, self.engine,
                       shots=self.shots, shot_key=shot_key,
                       noise_p=self.noise_p, noise_traj=self.noise_traj,
                       readout_p=self.readout_p, noise_key=noise_key,
                       zne_scales=self.zne_scales,
                       damp_gamma=self.damp_gamma,
                       dephase_p=self.dephase_p,
                       grad_method=self.grad_method, ps_chunk=self.ps_chunk)
        return out + bias


class HEAQNN(nn.Module):
    """Hardware-efficient-ansatz QNN (reference core/models_ms.py:92-124).
    net_size[:2] = (depth, linear_depth); no output bias."""
    num_qubits: int
    input_size: int
    net_size: Tuple[int, ...]
    scale_coeff: float = 0.01
    if_trainable_freq: bool = True
    ham_bound: Tuple[float, float] = (-5.0, 5.0)
    ham_diag: Optional[Tuple[float, ...]] = None
    ham_pauli: str = 'Z'
    engine: str = 'auto'
    shots: Optional[int] = None  # finite-shot measurement (see QuanONet)
    noise_p: Optional[float] = None  # noise trajectories (see QuanONet)
    noise_traj: int = 32
    readout_p: float = 0.0
    zne_scales: Optional[Tuple[float, ...]] = None  # ZNE (see QuanONet)
    damp_gamma: Optional[float] = None  # T1/T2 channels (see QuanONet)
    dephase_p: Optional[float] = None
    grad_method: str = 'autodiff'  # 'shift' = shift-rule VJP (see QuanONet)
    ps_chunk: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        depth = int(self.net_size[0])
        spec = heaqnn_spec(self.num_qubits, self.net_size)

        if self.if_trainable_freq:
            enc = TrainableFreq(depth * self.num_qubits, self.scale_coeff,
                                name='freq')(x)
        else:
            enc = FixedScale(depth * self.num_qubits, self.scale_coeff)(x)

        ansatz = self.param(
            'ansatz',
            lambda key, _: init_ansatz_weights(key, spec),
            spec.weight_shape())
        noisy = (self.noise_p is not None or self.readout_p
                 or self.damp_gamma is not None
                 or self.dephase_p is not None)
        shot_key = self.make_rng('shots') if (self.shots and not noisy) \
            else None
        noise_key = self.make_rng('noise') if noisy else None
        return _measure(spec, ansatz, enc, self.ham_bound, self.ham_diag,
                        self.ham_pauli, self.engine,
                        shots=self.shots, shot_key=shot_key,
                        noise_p=self.noise_p, noise_traj=self.noise_traj,
                        readout_p=self.readout_p, noise_key=noise_key,
                        zne_scales=self.zne_scales,
                        damp_gamma=self.damp_gamma,
                        dephase_p=self.dephase_p,
                        grad_method=self.grad_method,
                        ps_chunk=self.ps_chunk)

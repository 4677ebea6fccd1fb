"""
Device-mesh parallelism — a NEW capability layer (the reference has no
distributed support whatsoever: no NCCL/MPI/Gloo, no multi-device code,
SURVEY.md §2 & §5.8).  TPU-native design per the scaling-book recipe:
pick a Mesh, annotate shardings with NamedSharding/PartitionSpec, let XLA
insert the collectives over ICI.

Axes:
* ``data`` — batch data parallelism: the sample axis is sharded, params
  are replicated, XLA inserts the gradient psum;
* ``seed`` — multi-seed experiment parallelism: the reference runs seeds
  as separate OS processes (scripts/reproduce_benchmarks2.sh:89-122); here
  seeds are a vmapped leading axis of the parameter pytree, sharded across
  devices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, seed_parallel=1):
    """Create a ('data', 'seed') mesh over the first n_devices devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if n % seed_parallel != 0:
        raise ValueError(f"n_devices={n} not divisible by "
                         f"seed_parallel={seed_parallel}")
    shape = (n // seed_parallel, seed_parallel)
    dmesh = mesh_utils.create_device_mesh(shape, devices=devs[:n])
    return Mesh(dmesh, ('data', 'seed'))


def shard_batch(mesh, *arrays):
    """Place arrays with the batch axis sharded over 'data'."""
    sh = NamedSharding(mesh, P('data'))
    return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)


def replicate(mesh, tree):
    """Replicate a pytree over the whole mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(jnp.asarray(a), sh),
                                  tree)


def shard_seed_axis(mesh, tree):
    """Shard a pytree whose leaves have a leading seed axis over 'seed'."""
    sh = NamedSharding(mesh, P('seed'))
    return jax.tree_util.tree_map(lambda a: jax.device_put(jnp.asarray(a), sh),
                                  tree)


def make_dp_train_step(model_apply, optimizer, mesh, multi_seed=False):
    """Build a jitted single-batch data-parallel training step.

    DRYRUN/TEST-ONLY: this minimal step exists for the driver's
    ``dryrun_multichip`` hook and the mesh unit tests.  Production
    data-parallel training uses the full epoch-scan path in
    ``parallel/dp_solver.make_dp_run_segment`` (same sharding semantics,
    plus masked ragged batches and on-device best-param tracking).

    The returned step(params, opt_state, inputs, targets) -> (params,
    opt_state, loss) runs with the batch sharded over 'data' and params
    replicated (or seed-sharded when multi_seed); XLA inserts the psum for
    the gradient all-reduce over ICI.
    """
    def loss_fn(params, inputs, targets):
        pred = model_apply(params, *inputs)
        return jnp.mean((pred - targets) ** 2)

    def single_step(params, opt_state, inputs, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if multi_seed:
        # params/opt_state carry a leading seed axis; data broadcast to seeds
        def step(params, opt_state, inputs, targets):
            return jax.vmap(single_step,
                            in_axes=(0, 0, None, None))(params, opt_state,
                                                        inputs, targets)
        param_spec = P('seed')
    else:
        step = single_step
        param_spec = P()

    data_spec = P('data')
    # Annotate boundary shardings; XLA propagates internally and inserts
    # the gradient all-reduce over the 'data' axis.
    jit_step = jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, param_spec),
                      NamedSharding(mesh, param_spec),
                      NamedSharding(mesh, data_spec),
                      NamedSharding(mesh, data_spec)),
        out_shardings=(NamedSharding(mesh, param_spec),
                       NamedSharding(mesh, param_spec),
                       NamedSharding(mesh, param_spec if multi_seed else P())),
    )
    return jit_step

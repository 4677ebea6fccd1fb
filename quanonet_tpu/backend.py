"""
Backend manager — API-compatible shim over the reference's 5-way dispatch
(reference utils/backend.py:5-132).

The reference probes five ML frameworks and maps
(model_type, quantum_backend, classical_backend) to one of four solver
targets.  This framework has ONE engine, so every combination resolves to
the JAX solver; the class is kept so reference-style code that imports
``backend.check_compatibility`` keeps working, and so availability
reporting has one place to live (platform, device count, engine choices).
"""
import jax

QUANTUM_MODELS = ('QuanONet', 'HEAQNN')
CLASSICAL_MODELS = ('DeepONet', 'FNN', 'FNO')


class BackendManager:
    """Mirrors reference utils/backend.py:5-129 with a single target."""

    def __init__(self):
        self.available = self._probe()

    @staticmethod
    def _probe():
        avail = {'jax': True}
        for name in ('mindspore', 'mindquantum', 'torch', 'torchquantum',
                     'qiskit', 'pennylane', 'deepxde'):
            try:
                __import__(name)
                avail[name] = True
            except ImportError:
                avail[name] = False
        return avail

    def check_compatibility(self, model_type, quantum_backend='jax',
                            classical_backend='jax'):
        """(model, qb, cb) -> solver target.  Always 'jax': the engine
        covers every reference combination (legacy backend names are
        accepted and noted, not dispatched)."""
        if model_type not in QUANTUM_MODELS + CLASSICAL_MODELS:
            raise ValueError(
                f"Unknown model type '{model_type}'. Supported: "
                f"{QUANTUM_MODELS + CLASSICAL_MODELS}")
        return 'jax'

    def device_summary(self):
        devs = jax.devices()
        return {
            'platform': devs[0].platform,
            'num_devices': len(devs),
            'devices': [str(d) for d in devs],
        }


backend = BackendManager()

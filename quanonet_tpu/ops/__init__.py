from quanonet_tpu.ops.hea import HEASpec, hea_expectation, make_block_configs
from quanonet_tpu.ops.hamiltonian import (
    simple_ham_params, simple_ham_diag, ham_diag_full, zero_state_ham_diag,
)
from quanonet_tpu.ops.sampling import (
    sample_counts, sample_indices, shot_expectation, shot_noise_std,
)

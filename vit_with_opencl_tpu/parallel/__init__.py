from .multihost import initialize as initialize_multihost, make_hybrid_mesh  # noqa: F401
from .pipeline import make_pipe_mesh, pp_forward, shard_params_pp  # noqa: F401
from .spmd import (  # noqa: F401
    dp_forward_fn,
    gspmd_param_specs,
    make_mesh,
    make_train_step,
    shard_params_gspmd,
    shard_params_tp,
    sp_forward,
    to_tp_layout,
    tp_forward,
    tp_pspecs,
)

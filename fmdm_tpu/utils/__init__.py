"""Cross-cutting utils (config IO, run dirs, checkpointing, evaluation)."""

from fmdm_tpu.utils.config import (
    allocate_run_dir,
    load_json_config,
    resolve_batch_size,
    resolve_string_none,
    save_json_config,
    set_seed,
)
from fmdm_tpu.utils.checkpoint import (
    clone_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    maybe_load_checkpoint,
    load_model_params,
    save_checkpoint,
    save_checkpoint_with_mirrors,
)
from fmdm_tpu.utils.evaluation import (
    compute_ssim_sample,
    latent_shape,
    make_grid,
    prepare_eval_batch,
    psnr_from_mse,
    save_image,
    select_visual_indices,
    ssim,
)

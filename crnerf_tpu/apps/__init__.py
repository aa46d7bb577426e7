"""CLI entry points mirroring the reference's five apps (SURVEY.md §2.6):

    python -m crnerf_tpu.apps.prepare      (prepare_phototourism.py)
    python -m crnerf_tpu.apps.train        (train_mask_grid_sample.py)
    python -m crnerf_tpu.apps.eval         (eval.py)
    python -m crnerf_tpu.apps.eval_metric  (eval_metric.py)
    python -m crnerf_tpu.apps.video        (appearance_modification_video.py)

or the single dispatcher: ``python -m crnerf_tpu {prepare|train|eval|
metrics|video} ...``.
"""


def load_scene_from_config(cfg, split: str = "train"):
    """Dataset registry dispatch (reference dataset_dict,
    datasets/__init__.py:5-6)."""
    from crnerf_tpu.data import (
        load_blender,
        load_phototourism,
        make_synthetic_scene,
    )

    if cfg.dataset_name == "phototourism":
        return load_phototourism(
            cfg.root_dir,
            img_downscale=cfg.img_downscale,
            appearance_wh=tuple(cfg.appearance_wh),
            use_cache=cfg.use_cache,
        )
    if cfg.dataset_name == "blender":
        return load_blender(
            cfg.root_dir,
            split=split,
            img_wh=tuple(cfg.img_wh),
            perturbation=tuple(cfg.data_perturb),
            appearance_wh=tuple(cfg.appearance_wh),
        )
    if cfg.dataset_name == "synthetic":
        return make_synthetic_scene(
            appearance_wh=tuple(cfg.appearance_wh)
        )
    raise ValueError(f"unknown dataset {cfg.dataset_name!r}")

"""Shared experiment assembly: model, criterion, datasets from config.

Factored out of the train/eval CLIs (the reference duplicates this wiring in
scripts/train.py and scripts/eval.py). Supported datasets:

- ``7Scenes`` / ``RobotCar``: disk layouts identical to the reference;
- ``synth``: the in-memory synthetic scene (tests/benchmarks — this
  environment has no real image data).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..data import (
    MF,
    MFOnline,
    ImageTransform,
    Normalize,
    SyntheticScene,
    std_from_stats,
    vos_logq_fc_np,
    vos_logq_np,
    vos_simple_np,
)
from ..losses import MapNetCriterion, MapNetOnlineCriterion, PoseNetCriterion
from ..models import MapNet, PoseNet, load_npz, merge_variables, resnet34
from .config import ExperimentConfig

__all__ = [
    "build_model",
    "build_criteria",
    "build_transform",
    "build_device_preprocess",
    "build_raw_device_preprocess",
    "build_frame_dataset",
    "build_datasets",
    "experiment_name",
]


def build_model(
    model_name: str,
    config: ExperimentConfig,
    dtype=jnp.float32,
    trunk: str = "resnet34",
    bn_bf16_bwd: bool = False,
) -> tuple:
    """Returns (flax module, is_tuple_model).

    ``trunk`` selects the feature extractor (the reference hard-codes
    resnet34 at /root/reference/scripts/train.py:76, but its PoseNet accepts
    any torchvision trunk — /root/reference/models/posenet.py:36-46).
    ``bn_bf16_bwd`` enables the bfloat16 BN backward (+4-5% train step on
    hardware, all 200-step parity envelopes green — docs/
    TRAIN_PARITY_BN_BF16BWD.md; forward bit-identical, default off so the
    exact per-step golden guarantees hold).
    """
    from ..models import resnet18, resnet50

    trunks = {"resnet18": resnet18, "resnet34": resnet34,
              "resnet50": resnet50}
    if trunk not in trunks:
        raise ValueError(f"unknown trunk {trunk!r}; pick from {sorted(trunks)}")
    posenet = PoseNet(
        feature_extractor=trunks[trunk](dtype=dtype,
                                        bn_bf16_bwd=bn_bf16_bwd),
        droprate=config.dropout,
        filter_nans=(model_name == "mapnet++"),
        dtype=dtype,
    )
    if model_name == "posenet":
        return posenet, False
    if model_name.startswith("mapnet"):
        return MapNet(posenet=posenet), True
    raise ValueError(f"unknown model {model_name}")


def build_criteria(model_name: str, config: ExperimentConfig,
                   learn_beta: bool, learn_gamma: bool):
    """Returns (train_criterion, val_criterion) mirroring
    /root/reference/scripts/train.py:86-101 (sax/srx start at 0; beta/gamma
    seed saq/srq)."""
    if model_name == "posenet":
        return (
            PoseNetCriterion(sax=0.0, saq=config.beta, learn_beta=learn_beta),
            PoseNetCriterion(),
        )
    kwargs = dict(
        sax=0.0, saq=config.beta, srx=0.0, srq=config.gamma,
        learn_beta=learn_beta, learn_gamma=learn_gamma,
    )
    if model_name == "mapnet++":
        gps = config.vo_lib == "gps"
        return (
            MapNetOnlineCriterion(gps_mode=gps, **kwargs),
            MapNetOnlineCriterion(gps_mode=gps),
        )
    if model_name == "mapnet":
        return MapNetCriterion(**kwargs), MapNetCriterion()
    raise ValueError(f"unknown model {model_name}")


def build_transform(dataset: str, scene: str, config: ExperimentConfig,
                    asset_root: str = "data", train: bool = True,
                    seed: int = 7, keep_uint8: bool = False) -> ImageTransform:
    """Resize(256) [+ColorJitter] + Normalize(mean, sqrt(var)) pipeline
    (/root/reference/scripts/train.py:114-128).

    With ``keep_uint8`` the host emits resized uint8 and normalization moves
    on-device (pair with :func:`build_device_preprocess`) — 4x less
    host->device transfer per batch.
    """
    if dataset == "synth":
        return ImageTransform(resize=None, normalize=None)
    stats = np.loadtxt(Path(asset_root) / dataset / scene / "stats.txt")
    mean, std = std_from_stats(stats)
    return ImageTransform(
        resize=256,
        normalize=Normalize(mean, std),
        color_jitter_strength=config.color_jitter if train else 0.0,
        rng=np.random.RandomState(seed),
        keep_uint8=keep_uint8,
    )


def build_device_preprocess(dataset: str, scene: str,
                            asset_root: str = "data", dtype=jnp.float32):
    """Device-side normalize for the uint8 host path (or None for synth).

    The returned function is closed over the scene's pixel stats and is meant
    to be fused into the jit'd train/eval step (``preprocess=`` of
    :func:`geomapnet_tpu.train.make_train_step`), so the host ships raw
    resized uint8 and the (x/255 - mean)/std + dtype cast runs on device.
    """
    if dataset == "synth":
        return None
    from ..ops.image import normalize as device_normalize

    stats = np.loadtxt(Path(asset_root) / dataset / scene / "stats.txt")
    mean, std = std_from_stats(stats)
    mean = tuple(float(m) for m in mean)
    std = tuple(float(s) for s in std)

    def preprocess(images):
        return device_normalize(images, mean, std, dtype=dtype)

    return preprocess


def build_raw_device_preprocess(
    scene: str,
    asset_root: str = "data",
    dtype=jnp.float32,
    raw_size: tuple[int, int] = (960, 1280),
    resize: int = 256,
    camera_models_dir: str | None = None,
):
    """RobotCar raw-mosaic pipeline: the host ships untouched Bayer uint8 and
    demosaic -> [undistort] -> resize -> normalize all run fused on device
    (:func:`geomapnet_tpu.ops.image.make_device_pipeline` with the Pallas
    demosaic kernel on TPU). Pair with ``RobotCar(raw_bayer=True)``.

    Replaces the reference's offline ``process_robotcar_images.py`` +
    host-side SDK demosaic/undistort (/root/reference/dataset_loaders/
    robotcar.py:110-125) with zero host pixel work.
    """
    from ..ops.image import (
        make_device_pipeline,
        precompute_undistort_maps,
        resize_shorter_side_shape,
    )

    stats = np.loadtxt(Path(asset_root) / "RobotCar" / scene / "stats.txt")
    mean, std = std_from_stats(stats)
    maps = None
    if camera_models_dir:
        from ..data.robotcar_sdk import CameraModel

        cam = CameraModel(camera_models_dir, Path("stereo") / "centre")
        maps = precompute_undistort_maps(cam.lut, *raw_size)
    return make_device_pipeline(
        mean=tuple(float(m) for m in mean),
        std=tuple(float(s) for s in std),
        resize_to=resize_shorter_side_shape(*raw_size, resize),
        undistort_maps=maps,
        bayer=True,
        dtype=dtype,
    )


def build_frame_dataset(
    dataset: str,
    scene: str,
    data_path: str,
    train: bool,
    config: ExperimentConfig,
    transform=None,
    real: bool = False,
    skip_images: bool = False,
    asset_root: str = "data",
    vo_lib: str | None = None,
    raw_bayer: bool = False,
    native_loader: bool = False,
    cache_gb: float = 0.0,
):
    """Construct one frame dataset by name.

    ``native_loader`` routes color decode+resize through the C++ batch
    decoder (:mod:`geomapnet_tpu.native`: io_uring/pread batch reads,
    libjpeg/libpng with the GIL released, thread-pooled, fused bilinear
    resize) — the host-side counterpart of the device pipeline for
    end-to-end eval throughput (scripts/bench_e2e.py).

    ``cache_gb`` wraps the on-disk datasets in a decoded-frame RAM cache
    (:class:`~geomapnet_tpu.data.CachedScene`): image decode — the
    end-to-end bottleneck — is paid once, and every later epoch runs at
    memory speed. Skipped with a warning when the transform jitters
    (RobotCar training with color_jitter: caching would freeze one draw).
    """
    built = _build_frame_dataset(
        dataset, scene, data_path, train, config, transform, real,
        skip_images, asset_root, vo_lib, raw_bayer, native_loader,
    )
    if cache_gb > 0 and dataset != "synth" and not skip_images:
        from ..data import CachedScene

        try:
            built = CachedScene(built, max_bytes=int(cache_gb * 1024 ** 3))
        except ValueError as e:
            print(f"frame cache disabled for this split: {e}")
    return built


def _build_frame_dataset(
    dataset, scene, data_path, train, config, transform, real,
    skip_images, asset_root, vo_lib, raw_bayer, native_loader,
):
    if dataset == "synth":
        return SyntheticScene(
            n_frames=64, height=64, width=96, train=train, real=real,
            skip_images=skip_images, seed=config.seed,
        )
    if dataset == "7Scenes":
        from ..data.sevenscenes import SevenScenes

        return SevenScenes(
            scene=scene, data_path=data_path, train=train,
            transform=transform, seed=config.seed, real=real,
            skip_images=skip_images, vo_lib=vo_lib or config.vo_lib,
            asset_dir=str(Path(asset_root) / "7Scenes"),
            use_native=native_loader,
        )
    if dataset == "RobotCar":
        from ..data.robotcar import RobotCar

        return RobotCar(
            scene=scene, data_path=data_path, train=train,
            transform=None if raw_bayer else transform, seed=config.seed,
            real=real, skip_images=skip_images, vo_lib=vo_lib or "stereo",
            asset_dir=str(Path(asset_root) / "RobotCar"),
            raw_bayer=raw_bayer,
            use_native=native_loader and not raw_bayer,
        )
    raise ValueError(f"unknown dataset {dataset}")


def build_datasets(
    model_name: str,
    dataset: str,
    scene: str,
    data_path: str,
    config: ExperimentConfig,
    asset_root: str = "data",
    keep_uint8: bool = False,
    raw_bayer: bool = False,
    native_loader: bool = False,
    cache_gb: float = 0.0,
):
    """(train_set, val_set) for a model family, mirroring
    /root/reference/scripts/train.py:131-156. ``cache_gb`` is a per-split
    decoded-frame RAM budget (see :func:`build_frame_dataset`)."""
    tf_train = build_transform(dataset, scene, config, asset_root, train=True,
                               seed=config.seed, keep_uint8=keep_uint8)
    tf_val = build_transform(dataset, scene, config, asset_root, train=False,
                             seed=config.seed, keep_uint8=keep_uint8)

    def frames(train, transform, real=False, skip_images=False, vo_lib=None):
        return build_frame_dataset(
            dataset, scene, data_path, train, config, transform=transform,
            real=real, skip_images=skip_images, asset_root=asset_root,
            vo_lib=vo_lib, raw_bayer=raw_bayer, native_loader=native_loader,
            cache_gb=cache_gb,
        )

    if model_name == "posenet":
        return frames(True, tf_train), frames(False, tf_val)

    mf_kwargs = dict(
        steps=config.steps, skip=config.skip,
        variable_skip=config.variable_skip, seed=config.seed,
    )
    if model_name == "mapnet":
        train_set = MF(frames(True, tf_train, real=config.real), **mf_kwargs)
        val_set = MF(frames(False, tf_val, real=config.real), **mf_kwargs)
        return train_set, val_set

    if model_name == "mapnet++":
        gps = config.vo_lib == "gps"
        train_mf = MF(frames(True, tf_train), **mf_kwargs)
        unlab = frames(False, tf_train, real=True, vo_lib=config.vo_lib)
        gt_for_unlab = (
            None if gps else frames(False, tf_val, skip_images=True)
        )
        val_mf = MF(
            unlab, include_vos=not gps, real=not gps,
            no_duplicates=True, gt_dataset=gt_for_unlab,
            vo_func=vos_logq_np, **mf_kwargs,
        )
        return MFOnline(train_mf, val_mf, gps_mode=gps), None

    raise ValueError(f"unknown model {model_name}")


def experiment_name(dataset, scene, model, config_file, learn_beta,
                    learn_gamma, suffix="") -> str:
    """`{dataset}_{scene}_{model}_{config}[_learn_beta][_learn_gamma]{suffix}`
    (/root/reference/scripts/train.py:159-167)."""
    config_name = Path(config_file).stem
    name = f"{dataset}_{scene}_{model}_{config_name}"
    if learn_beta:
        name += "_learn_beta"
    if learn_gamma:
        name += "_learn_gamma"
    return name + suffix

"""Dataset pipeline (reference ``Reflected-Diffusion/datasets.py``).

TPU-native design: the GTO Halo training set is ~100k x 67 float32 — a few
tens of MB — so instead of a torch DataLoader with worker processes, we
vectorise the whole preprocessing once into a device-resident array and
serve random batches by on-device gather, keeping the input pipeline off
the host entirely (the north star's "pkl -> pad -> reshape as on-device
gather/reshape").  Per-host sharding replaces ``DistributedSampler``: each
JAX process draws from its contiguous shard
(reference ``datasets.py:152-175``).

Preprocessing parity (reference ``datasets.py:82-98``):
  * label = vec[0] (the normalised halo-energy classifier);
  * pad 67 -> 81 with zeros, standardise with the reference's hardcoded
    global mean/std (0.4652 / 0.1811), reshape to 9x9x1 (NHWC).
"""
from __future__ import annotations

import os
import pickle
import warnings
from typing import Iterator, Tuple

import numpy as np

GTO_MEAN = 0.4652
GTO_STD = 0.1811


def make_synthetic_gto_pkl(path: str, n: int = 1024, seed: int = 0) -> str:
    """Synthesize a [N, 67] training pickle in the documented layout
    (SURVEY.md 2.6: [alpha_norm, 3 times, 20x(ux,uy,uz), fuel, period,
    manifold] all normalised to [0,1]).  The reference repository strips the
    real 100k-row pkl (``.MISSING_LARGE_BLOBS``), so tests and demos build
    fixtures with this."""
    rng = np.random.default_rng(seed)
    data = rng.uniform(0.05, 0.95, size=(n, 67)).astype(np.float32)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


class GTOHaloImageDataset:
    """Vectorised equivalent of reference ``datasets.py:82-98``.

    ``mean``/``std`` default to the reference's hardcoded global constants.
    NOTE the reference pipeline is self-inconsistent here: the rows are
    already normalised to [0, 1] (the reflected SDE's domain), yet it
    standardises them to ~[-2.6, 3.0] — outside the cube — so training
    folds the data through ``reflect`` and the benchmark's
    de-standardisation squeezes every sampled variable into
    [0.4652, 0.6463] (~18% of its physical range).  ``mean=0, std=1``
    disables that and runs the reflected diffusion as designed; the
    constants are recorded in the run config so evaluation inverts with
    the same values either way.
    """

    def __init__(self, pkl_path: str, mean: float = GTO_MEAN,
                 std: float = GTO_STD):
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        data = np.asarray(data, dtype=np.float32)
        if data.ndim != 2 or data.shape[1] > 81:
            raise ValueError(f"expected [N, <=81] trajectory vectors, got {data.shape}")
        self.raw = data
        self.mean, self.std = float(mean), float(std)
        n, d = data.shape
        self.labels = data[:, :1].copy()  # first value as label
        padded = np.zeros((n, 81), np.float32)
        padded[:, :d] = data
        padded = (padded - self.mean) / self.std
        # The reflected SDE lives on [0,1]^D: standardisation that moves
        # training data outside the cube (the reference-faithful default,
        # see class docstring) silently degrades the model.  Warn on the
        # REAL data columns (the 67->81 zero-padding is standardised too,
        # but carries no signal).
        frac_out = float(((padded[:, :d] < 0.0) | (padded[:, :d] > 1.0)).mean())
        if frac_out > 0.01:
            warnings.warn(
                f"GTOHaloImageDataset: standardisation (mean={self.mean}, "
                f"std={self.std}) pushed {frac_out:.0%} of training values "
                f"outside the reflected SDE's [0,1] domain — this is the "
                f"reference-faithful but degraded configuration.  Set "
                f"data.gto_mean=0 data.gto_std=1 to train on the unit cube "
                f"as designed (see README quickstart).", stacklevel=2)
        self.images = padded.reshape(n, 9, 9, 1)  # NHWC

    def __len__(self):
        return self.images.shape[0]

    def __getitem__(self, idx):
        return self.images[idx], self.labels[idx]


class GTOHaloTrajectoryDataset:
    """1-D variant (reference ``datasets.py:68-80``): standardised [N, 67]
    rows, dummy label."""

    def __init__(self, pkl_path: str):
        with open(pkl_path, "rb") as f:
            data = pickle.load(f)
        self.data = (np.asarray(data, np.float32) - GTO_MEAN) / GTO_STD

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, idx):
        return self.data[idx], 0


def load_cifar10(dataroot: str, train: bool = True):
    """CIFAR-10 from the standard ``cifar-10-batches-py`` pickles
    (torchvision-free; reference uses ``vdsets.CIFAR10``,
    ``datasets.py:116-117``).  Returns (images [N,32,32,3] float [0,1],
    labels [N,1])."""
    base = os.path.join(dataroot, "cifar-10-batches-py")
    files = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for name in files:
        with open(os.path.join(base, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(np.asarray(d[b"data"], np.uint8))
        ys.append(np.asarray(d[b"labels"], np.int64))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.concatenate(ys)[:, None].astype(np.float32)
    return (x.astype(np.float32) / 255.0), y


def load_image_folder(root: str):
    """All images in a directory -> [N, H, W, 3] float array (reference
    ``ImageFolderFast``, ``datasets.py:29-45``)."""
    from PIL import Image
    paths = sorted(os.listdir(root))
    imgs = []
    for p in paths:
        with Image.open(os.path.join(root, p)) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
    return np.stack(imgs)


def load_image_folder_class(root: str):
    """Image folder with ``dataset.json`` labels (reference
    ``ImageFolderClassFast``, ``datasets.py:48-66``)."""
    import json
    from PIL import Image
    with open(os.path.join(root, "dataset.json")) as f:
        pairs = json.load(f)["labels"]
    imgs, labels = [], []
    for rel, label in pairs:
        with Image.open(os.path.join(root, rel)) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
        labels.append(label)
    return np.stack(imgs), np.asarray(labels, np.float32)[:, None]


def _epoch_iterator(images, labels, batch: int, seed: int, shard: Tuple[int, int],
                    shuffle: bool = True) -> Iterator:
    """Infinite epoch-reshuffled batch iterator over this host's shard
    (replaces cycle_loader + DistributedSampler, reference
    ``datasets.py:21-26,152-175``)."""
    n_proc, proc_idx = shard
    rng = np.random.default_rng(seed)
    n = images.shape[0]
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        order = order[proc_idx::n_proc]  # per-host interleaved shard
        for i in range(0, len(order) - batch + 1, batch):
            sel = order[i:i + batch]
            yield images[sel], labels[sel]
        if len(order) < batch:  # tiny dataset: sample with replacement
            sel = rng.integers(0, n, size=batch)
            yield images[sel], labels[sel]


def index_iterator(n: int, batch: int, seed: int, shard: Tuple[int, int]):
    """Infinite epoch-reshuffled BATCH-INDEX iterator (for the on-device
    dataset path: only indices cross the host boundary)."""
    n_proc, proc_idx = shard
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n)[proc_idx::n_proc]
        for i in range(0, len(order) - batch + 1, batch):
            yield order[i:i + batch].astype(np.int32)
        if len(order) < batch:
            yield rng.integers(0, n, size=batch).astype(np.int32)


def load_arrays(config, evaluation: bool = False):
    """Load the full dataset as (images, labels) numpy arrays."""
    name = config.data.dataset
    if name == "GTOHaloImage":
        ds = GTOHaloImageDataset(config.data.pkl_path,
                                 mean=config.data.get("gto_mean", GTO_MEAN),
                                 std=config.data.get("gto_std", GTO_STD))
        images, labels = ds.images, ds.labels
    elif name == "GTOHalo":
        ds = GTOHaloTrajectoryDataset(config.data.pkl_path)
        images = ds.data[:, None, :]  # [N, 1, 67] channel-first 1-D seqs
        labels = np.zeros((len(ds), 1), np.float32)
    elif name == "CIFAR10":
        images, labels = load_cifar10(config.dataroot, train=not evaluation)
    elif name == "ImageNet32":
        split = "valid_32x32" if evaluation else "train_32x32"
        images = load_image_folder(
            os.path.join(config.dataroot, "ds_imagenet", split))
        labels = np.zeros((len(images), 1), np.float32)
    elif name == "ImageNet64C":
        split = "valid" if evaluation else "train"
        images, labels = load_image_folder_class(
            os.path.join(config.dataroot, "imagenet-64x64", split))
    else:
        raise ValueError(f"{name} is not valid")
    return images, labels


def get_dataset(config, evaluation: bool = False, distributed: bool = True):
    """Build infinite train/eval iterators of (images NHWC, labels)
    (reference ``datasets.py:100-194``).  Batch sizes are GLOBAL; each JAX
    process yields its ``1/process_count`` share, mirroring the reference's
    per-GPU ``batch_size // ngpus`` (``datasets.py:178``)."""
    import jax

    images, labels = load_arrays(config, evaluation=evaluation)

    n_proc = jax.process_count() if distributed else 1
    proc = jax.process_index() if distributed else 0

    if evaluation:
        per_host = config.eval.batch_size // n_proc
        return _epoch_iterator(images, labels, per_host, seed=7,
                               shard=(n_proc, proc), shuffle=False)

    if config.training.batch_size % n_proc != 0:
        raise ValueError(
            f"Train batch size {config.training.batch_size} not divisible by {n_proc} hosts")
    if config.eval.batch_size % n_proc != 0:
        raise ValueError(
            f"Eval batch size {config.eval.batch_size} not divisible by {n_proc} hosts")
    train_it = _epoch_iterator(images, labels, config.training.batch_size // n_proc,
                               seed=0, shard=(n_proc, proc))
    eval_it = _epoch_iterator(images, labels, config.eval.batch_size // n_proc,
                              seed=1, shard=(n_proc, proc))
    return train_it, eval_it

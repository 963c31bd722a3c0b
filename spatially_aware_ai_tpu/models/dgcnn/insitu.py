"""In-situ learning: on-the-fly DGCNN fine-tuning on user-labeled objects.

API contract recovered from the reference's call sites (SURVEY.md §2.5,
clip_seem_fusion.py:142-158, handy_utils.py:396-425, app_unity.py:169-194):

- `.labels`: list, index 0 = null class, user labels appended
- `.model_trained`: bool
- `.predict_object(clip_feats, rgb, voxels) -> int` label index (0 = no match)
- `.prepare_data(scene_knowledges, voxel_data)` + `.train_model()`
- `.reset_model(delete_weights=True)`
- persistence: weights + labels json shared across scan versions

Featurization (the reference's InSituVoxelData is absent; ours): each object
is `num_points` voxels sampled with replacement, each point carrying
[centered+scale-normalized xyz (3), rgb (3), CLIP (512)].

Training runs fully on device with optax (SGD+momentum or Adam, cosine decay,
label smoothing), static shapes (label space padded to output_channels=50),
so adding labels or objects never triggers recompilation.
"""
from __future__ import annotations

import json
import os
import pickle
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .model import DGCNN, DGCNNConfig


def featurize_object(clip_feats, rgb, voxels, num_points: int, rng=None):
    """One object -> [num_points, 3 + 3 + C] float32 point features."""
    voxels = np.asarray(voxels, np.float32)
    rgb = np.nan_to_num(np.asarray(rgb, np.float32))
    clip_feats = np.nan_to_num(np.asarray(clip_feats, np.float32))
    m = len(voxels)
    if m == 0:
        C = clip_feats.shape[-1] if clip_feats.ndim == 2 else 0
        return np.zeros((num_points, 6 + C), np.float32)
    if rng is None:
        rng = np.random.default_rng(0)
    idx = rng.integers(0, m, size=num_points)
    pts = voxels[idx]
    center = pts.mean(axis=0, keepdims=True)
    pts = pts - center
    scale = max(float(np.abs(pts).max()), 1e-6)
    pts = pts / scale
    return np.concatenate([pts, rgb[idx], clip_feats[idx]], axis=-1).astype(
        np.float32
    )


class InSituLearning:
    def __init__(
        self,
        model: str = "dgcnn",
        device=None,  # accepted for API parity; jax manages devices
        emb_dims: int = 1024,
        k_neighbors: int = 20,
        dropout: float = 0.5,
        output_channels: int = 50,
        num_points: int = 30,
        cool_down_epochs: int = 10,
        batch_size: int = 128,
        use_sgd: bool = False,
        lr: float = 0.001,
        momentum: float = 0.9,
        epochs: int = 200,
        model_path: Optional[str] = None,
        label_path: Optional[str] = None,
        feature_dim: int = 512,
        seed: int = 1,
        confidence_threshold: float = 0.5,
    ):
        self.cfg = DGCNNConfig(
            in_channels=6 + feature_dim,
            k_neighbors=k_neighbors,
            emb_dims=emb_dims,
            dropout=dropout,
            output_channels=output_channels,
            num_points=num_points,
        )
        self.model = DGCNN(self.cfg)
        self.num_points = num_points
        self.batch_size = batch_size
        self.epochs = epochs
        self.cool_down_epochs = cool_down_epochs
        self.use_sgd = use_sgd
        self.lr = lr
        self.momentum = momentum
        self.model_path = model_path
        self.label_path = label_path
        self.seed = seed
        self.confidence_threshold = confidence_threshold

        self.labels: List = [None]  # index 0 = null class
        self.model_trained = False
        self._train_examples = None  # (points [M, N, C], labels [M])
        self.variables = None
        self._rng = np.random.default_rng(seed)
        # (schedule horizon) -> (optimizer, jitted epoch-chunk trainer);
        # see _get_train_fns
        self._train_fns = {}

        self._load_if_exists()

    # -- persistence ---------------------------------------------------------

    def _load_if_exists(self):
        if self.label_path and os.path.exists(self.label_path):
            with open(self.label_path) as f:
                self.labels = json.load(f)
        if self.model_path and os.path.exists(self.model_path):
            with open(self.model_path, "rb") as f:
                self.variables = pickle.load(f)
            self.model_trained = True

    def save(self):
        # atomic (utils/atomic.py): weights/labels persist across scan
        # versions and server restarts; a crash mid-save must leave the
        # previous complete checkpoint, never a torn pickle
        from ...utils.atomic import atomic_json_dump, atomic_pickle_dump

        if self.model_path and self.variables is not None:
            atomic_pickle_dump(self.model_path,
                               jax.device_get(self.variables))
        if self.label_path:
            atomic_json_dump(self.label_path, self.labels, default=str)

    def reset_model(self, delete_weights: bool = True):
        """app_unity.py:191-194 contract."""
        self.variables = None
        self.model_trained = False
        self.labels = [None]
        self._train_examples = None
        if delete_weights and self.model_path and os.path.exists(self.model_path):
            os.remove(self.model_path)
        if delete_weights and self.label_path and os.path.exists(self.label_path):
            os.remove(self.label_path)

    # -- data ----------------------------------------------------------------

    def prepare_data(self, scene_knowledge, voxel_clip_feats, voxel_rgb):
        """Collect training examples from user-labeled objects.

        user_modified objects train as their gt_label's index; other objects
        train as the null class (0) to give the classifier contrast.
        """
        pts_list, y_list = [], []
        uo = scene_knowledge["unique_objects"]
        for obj_id, info in uo.items():
            vox = np.asarray(info["voxels"], np.int64)
            if len(vox) == 0:
                continue
            vidx = tuple(vox.T)
            label_idx = 0
            if info.get("user_modified") and info.get("gt_label") in self.labels:
                label_idx = self.labels.index(info["gt_label"])
            # several resamples per object for augmentation coverage
            for _ in range(8):
                pts_list.append(
                    featurize_object(
                        voxel_clip_feats[vidx], voxel_rgb[vidx], vox,
                        self.num_points, self._rng,
                    )
                )
                y_list.append(label_idx)
        if not pts_list:
            self._train_examples = None
            return 0
        self._train_examples = (
            np.stack(pts_list).astype(np.float32),
            np.array(y_list, np.int32),
        )
        return len(y_list)

    # -- training ------------------------------------------------------------

    def _make_optimizer(self, horizon: int):
        sched = optax.cosine_decay_schedule(
            self.lr * (100.0 if self.use_sgd else 1.0), horizon, alpha=0.01
        )
        if self.use_sgd:
            return optax.sgd(sched, momentum=self.momentum)
        return optax.adamw(sched, weight_decay=1e-4)

    # epochs per compiled scan: small enough that the cool-down early stop
    # (checked on host between chunks) never overshoots by much, large
    # enough that host<->device sync is amortized ~25x
    TRAIN_EPOCH_CHUNK = 25

    def _get_train_fns(self, horizon: int):
        """Optimizer + jitted epoch-chunk trainer, cached per schedule
        horizon. The jit wrapper must be REUSED across train_model calls:
        a fresh wrapper per call would re-trace and re-load the compile
        cache on every /insitu_learn (tens of seconds over the serialized
        remote-compile tunnel). The closure captures only static config
        (model graph, batch/point sizes, optimizer); the training set and
        its real-example count are jit ARGUMENTS — see train_model."""
        cached = self._train_fns.get(horizon)
        if cached is not None:
            return cached
        tx = self._make_optimizer(horizon)
        B = self.batch_size
        num_points = self.num_points
        out_ch = self.cfg.output_channels

        @partial(jax.jit, static_argnames=("length",))
        def train_chunk(params, batch_stats, opt_state, key, pts_d, ys_d,
                        n_real, length):
            def epoch_step(carry, _):
                params, bs, opt, key = carry
                key, ek, jk, dk = jax.random.split(key, 4)
                sel = jax.random.randint(ek, (B,), 0, n_real)
                batch_pts = jnp.take(pts_d, sel, axis=0)
                jitter = 0.02 * jax.random.normal(
                    jk, (B, num_points, 3), jnp.float32
                )
                batch_pts = batch_pts.at[..., :3].add(jitter)
                batch_ys = jnp.take(ys_d, sel)

                def loss_fn(p):
                    logits, updates = self.model.apply(
                        {"params": p, "batch_stats": bs},
                        batch_pts,
                        train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": dk},
                    )
                    onehot = jax.nn.one_hot(batch_ys, out_ch)
                    onehot = optax.smooth_labels(onehot, 0.1)
                    loss = optax.softmax_cross_entropy(
                        logits, onehot
                    ).mean()
                    acc = (logits.argmax(-1) == batch_ys).mean()
                    return loss, (updates["batch_stats"], acc)

                (loss, (new_bs, acc)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt = tx.update(grads, opt, params)
                params = optax.apply_updates(params, updates)
                return (params, new_bs, opt, key), (loss, acc)

            (params, bs, opt, key), (losses, accs) = jax.lax.scan(
                epoch_step, (params, batch_stats, opt_state, key), None,
                length=length,
            )
            return params, bs, opt, key, losses, accs

        self._train_fns[horizon] = (tx, train_chunk)
        return tx, train_chunk

    def train_model(self, epochs: Optional[int] = None):
        """On-device training loop, TPU-first: the training set uploads
        ONCE and each compiled call runs a lax.scan over a CHUNK of epochs
        (per-epoch batch sampling, point jitter, dropout all from
        jax.random inside the scan). The naive per-epoch formulation paid
        an 8 MB host->device batch upload + a blocking scalar sync every
        epoch — 200+ s for a 200-epoch fine-tune over a slow link vs a few
        seconds scanned (benchmarks/bench_insitu.py).

        The cool-down early stop (reference hparam,
        clip_seem_fusion.py:150) is evaluated on host from the per-epoch
        accuracy trace after each chunk; training may run up to CHUNK-1
        epochs past the stop point, which only deepens an already-perfect
        fit within the same cosine schedule."""
        if self._train_examples is None:
            return {"trained": False, "reason": "no training data"}
        epochs = epochs or self.epochs
        pts, ys = self._train_examples
        M = len(ys)
        key = jax.random.PRNGKey(self.seed)

        if self.variables is None:
            self.variables = self.model.init(
                key, jnp.zeros((2, self.num_points, self.cfg.in_channels)),
                train=False,
            )
        tx, train_chunk = self._get_train_fns(epochs)
        params = self.variables["params"]
        batch_stats = self.variables.get("batch_stats", {})
        opt_state = tx.init(params)

        # The training set is passed to the jit as an ARGUMENT, padded to a
        # power-of-two example capacity, with the real example count as a
        # traced scalar sampling bound. Closing over the data instead would
        # bake it into the HLO as constants — every /insitu_learn call with
        # fresh labels (the normal case) would then miss the compile cache
        # and pay the full serialized remote compile, breaking the module
        # contract above. With bucketing, only crossing a capacity
        # power-of-two recompiles (a per-shape, not per-content, event).
        cap = max(64, 1 << (M - 1).bit_length())
        if cap > M:
            pts = np.concatenate(
                [pts, np.zeros((cap - M,) + pts.shape[1:], np.float32)]
            )
            ys = np.concatenate([ys, np.zeros(cap - M, np.int32)])
        pts_d = jnp.asarray(pts)
        ys_d = jnp.asarray(ys)
        n_real = jnp.asarray(M, jnp.int32)

        chunk = min(epochs, self.TRAIN_EPOCH_CHUNK)
        last_loss, last_acc = np.inf, 0.0
        perfect_streak = 0
        epochs_run = 0
        stop = False
        while epochs_run < epochs and not stop:
            length = min(chunk, epochs - epochs_run)
            params, batch_stats, opt_state, key, losses, accs = train_chunk(
                params, batch_stats, opt_state, key, pts_d, ys_d, n_real,
                length
            )
            losses = np.asarray(losses, np.float32)
            accs = np.asarray(accs, np.float32)
            # the whole chunk has already executed on device, so account
            # for every epoch in it (params/telemetry stay consistent);
            # the stop flag just ends the outer loop
            for i in range(length):
                last_loss, last_acc = float(losses[i]), float(accs[i])
                epochs_run += 1
                # cool-down early stop: after the classifier holds perfect
                # training accuracy for cool_down_epochs consecutive
                # epochs, further fine-tuning only risks overfitting the
                # handful of user objects
                perfect_streak = (
                    perfect_streak + 1 if last_acc >= 1.0 else 0
                )
                if (
                    self.cool_down_epochs > 0
                    and perfect_streak >= self.cool_down_epochs
                    and epochs_run >= epochs // 4
                ):
                    stop = True

        self.variables = {"params": params, "batch_stats": batch_stats}
        self.model_trained = True
        self.save()
        return {"trained": True, "loss": last_loss, "acc": last_acc,
                "examples": int(M), "epochs_run": epochs_run}

    # -- inference -----------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def _forward(self, variables, pts):
        # jitted + cached per batch-bucket shape: the eager apply issued
        # dozens of small dispatches per call
        fwd = getattr(self, "_fwd_jit", None)
        if fwd is None:
            fwd = self._fwd_jit = jax.jit(
                lambda v, p: self.model.apply(v, p, train=False)
            )
        return fwd(variables, pts)

    def predict_object(self, clip_feats, rgb, voxels) -> int:
        """Classify one object; returns its label index, or 0 when unknown /
        below the confidence threshold (handy_utils.py:396-425 contract)."""
        return self.predict_objects([(clip_feats, rgb, voxels)])[0]

    def predict_objects(self, items) -> list:
        """Batched re-identification: classify MANY objects in one device
        round trip. items = [(clip_feats, rgb, voxels), ...] per object;
        returns a label index per item (0 = unknown / below confidence).

        The per-object path paid one dispatch + one blocking device sync
        per discovered object — a reprocess of a 200-object scene spent
        ~200 tunnel round trips in the re-id hook alone. Here every object
        featurizes on host, the batch pads to a power-of-two bucket (one
        compiled program per bucket), and ONE forward + ONE readback
        classifies them all."""
        if not self.model_trained or self.variables is None or not items:
            return [0] * len(items)
        pts = np.stack([
            featurize_object(cf, rgb, vox, self.num_points, self._rng)
            for cf, rgb, vox in items
        ]).astype(np.float32)
        B = len(items)
        cap = max(8, 1 << (B - 1).bit_length())
        if cap > B:
            pts = np.concatenate(
                [pts, np.zeros((cap - B,) + pts.shape[1:], np.float32)]
            )
        logits = np.asarray(
            self._forward(self.variables, jnp.asarray(pts))
        )[:B, : len(self.labels)]
        logits = logits - logits.max(axis=-1, keepdims=True)
        probs = np.exp(logits)
        probs /= probs.sum(axis=-1, keepdims=True)
        preds = probs.argmax(axis=-1)
        conf = probs[np.arange(B), preds]
        preds[(preds == 0) | (conf < self.confidence_threshold)] = 0
        return [int(p) for p in preds]

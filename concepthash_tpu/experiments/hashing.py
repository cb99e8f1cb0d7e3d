"""Experiment drivers: train+retrieve, train-only, eval-only.

JAX redesign of reference experiments/{train_helper,train_no_eval,
test_hashing}.py — same run-dir artifacts (config.yaml, models/{best,last},
{train,test}_history.json, outputs/ code dumps), same epoch/eval_interval/
best-tracking/resume semantics, but the method logic is a registry entry and
every hot path is a jitted pure function over a device mesh.
"""

from __future__ import annotations

import logging
import os
import time
import zlib

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.config.loader import save_config
from concepthash_tpu.data.manifest import HashingDataset
from concepthash_tpu.data.pipeline import Loader, seeding
from concepthash_tpu.data.preprocess import preprocess_batch
from concepthash_tpu.methods import Method, get_method, prepare_codebook
from concepthash_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                           shard_batch_chunk)
from concepthash_tpu.ops.retrieval import calculate_mAP, calculate_pr_curve
from concepthash_tpu.train.optim import build_optimizer, current_lr
from concepthash_tpu.train.state import (create_train_state, make_eval_step,
                                         make_multi_eval_step,
                                         make_multi_train_step, make_train_step)
from concepthash_tpu.utils import io
from concepthash_tpu.utils.logger import HistoryWriter, Tracker, setup_logging
from concepthash_tpu.utils.machine_stats import print_stats
from concepthash_tpu.utils.meters import MeterBank

_AUGMENT_BY_TRANSFORM = {
    "trivialaugment": "trivial",
    "simple": "rrc",
    "randcrop": "randcrop",
    "test": None,
    "no_augmentation": None,
    None: "trivial",
}


def _pseudo_embeddings(class_names, dim: int = 512):
    """Deterministic per-class pseudo-embeddings (no logging — callers that
    loop per class warn once themselves)."""
    out = [np.random.default_rng(zlib.crc32(n.encode())).standard_normal(dim)
           for n in class_names]
    return np.stack(out).astype(np.float32)


def offline_text_embedder(class_names, dim: int = 512):
    """Deterministic per-class pseudo-embeddings for zero-egress environments
    (real language guidance needs the CLIP text checkpoint; loudly logged)."""
    logging.warning("CLIP text checkpoint unreachable — codebook falls back to "
                    "deterministic pseudo-embeddings (no language guidance)")
    return _pseudo_embeddings(class_names, dim)


class RetrievalExperiment:
    """Train + periodic retrieval eval (reference RetrievalExperiment,
    experiments/train_helper.py:47-304)."""

    eval_metric = "mAP"
    higher_is_better = True

    def __init__(self, config: dict):
        self.config = config
        self.logdir = config["logdir"]
        os.makedirs(self.logdir, exist_ok=True)
        io.init_save_queue()
        setup_logging(os.path.join(self.logdir, "log.txt"))
        seeding(int(config.get("seed", 42)))
        print_stats()
        save_config(config, os.path.join(self.logdir, "config.yaml"))

        from concepthash_tpu.utils.diagnostics import StepProfiler, apply_debug_flags

        apply_debug_flags(config.get("debug"))
        self.profiler = StepProfiler(config.get("profile"), self.logdir)

        self.method: Method = get_method(config["model"]["name"])
        self.multiclass = bool(config.get("dataset", {}).get("multiclass", False))

        self._load_data()
        self._build_method()
        # config-gated event tracker behind the reference's `wandb:` key
        # (train_helper.py:125-139; default off, configs/train.yaml:28) —
        # local JSONL instead of the wandb service, see utils/logger.py
        self.tracker = Tracker(config.get("wandb", False), self.logdir)
        self.train_history = HistoryWriter(self.logdir, "train",
                                           tracker=self.tracker)
        self.test_history = HistoryWriter(self.logdir, "test",
                                          tracker=self.tracker)
        self.best_metric = None
        self.start_epoch = 0
        if config.get("resume_logdir"):
            self.resume_training(config["resume_logdir"])
        elif config.get("finetune_path"):
            self.finetune_init(config["finetune_path"])

    # ------------------------------------------------------------------ data
    def _load_data(self):
        cfg = self.config
        ds = cfg["dataset"]
        root = os.path.join(cfg.get("data_dir", "."), ds["data_folder"])
        nclass = int(ds["nclass"])
        shots = int(ds.get("num_shots", 0) or 0)
        self.datasets = {
            "train": HashingDataset(root, "train.txt", nclass, num_shots=shots),
            "test": HashingDataset(root, "test.txt", nclass),
            "db": HashingDataset(root, "database.txt", nclass),
        }
        for k, v in self.datasets.items():
            logging.info("%s dataset: %d items", k, len(v))
        # methods with train-set-sized state (HashNet memory bank) read this
        # (reference trainers/hashnet.py:11 injects train_size the same way)
        cfg["_train_size_"] = len(self.datasets["train"])

        bs = int(cfg.get("batch_size", 64))
        self.mesh = make_mesh()
        ndev = self.mesh.devices.size
        if bs % ndev != 0:
            # shrink the mesh to the largest divisor so static batches shard
            div = max(d for d in range(1, ndev + 1) if bs % d == 0)
            logging.warning("batch_size %d not divisible by %d devices; "
                            "using %d-device mesh", bs, ndev, div)
            self.mesh = make_mesh(div)

        resize = int(ds.get("resize", 256))
        cache = bool(cfg.get("cache_images", len(self.datasets["train"]) < 20000))
        seed = int(cfg.get("seed", 42))
        native = bool(cfg.get("native_decode", False))
        self._loader_kw = dict(resize=resize, cache=cache,
                               native_decode=native)
        self.loaders = {
            "train": Loader(self.datasets["train"], bs, resize=resize,
                            shuffle=True, drop_last=True, seed=seed,
                            cache=cache, native_decode=native),
            "test": Loader(self.datasets["test"], bs, resize=resize,
                           cache=cache, native_decode=native),
            "db": Loader(self.datasets["db"], bs, resize=resize, cache=cache,
                         native_decode=native),
        }
        self.crop = int(ds.get("crop", 224))
        self.norm = int(ds.get("norm", 2))
        tname = (cfg.get("_choices_", {}) or {}).get("transforms") or \
            cfg.get("transforms_name")
        self.augment = _AUGMENT_BY_TRANSFORM.get(tname, "trivial")
        logging.info("transforms: %s -> augment=%s norm=%d crop=%d",
                     tname, self.augment, self.norm, self.crop)

    def _prepare_filip_tokens(self):
        """Token-level class-text embeddings for the FILIP variant; offline
        environments get deterministic pseudo-tokens (loudly logged)."""
        from concepthash_tpu.data.manifest import read_class_names
        from concepthash_tpu.models.backbone_factory import (
            vision_config_from_backbone_cfg,
        )

        cfg = self.config
        root = os.path.join(cfg.get("data_dir", "."),
                            cfg["dataset"]["data_folder"])
        names = read_class_names(root)
        try:
            from concepthash_tpu.train.codebook import embed_class_name_tokens

            te = embed_class_name_tokens(
                names, cfg.get("backbone", {}).get("name",
                                                   "openai/clip-vit-base-patch32"))
        except Exception as e:
            logging.warning("FILIP token embeddings unavailable (%s); "
                            "deterministic pseudo-tokens", e)
            dim = vision_config_from_backbone_cfg(
                cfg.get("backbone", {}) or {}).projection_dim
            te = np.stack([_pseudo_embeddings([f"{n}#{t}" for t in range(8)],
                                              dim=dim) for n in names])
        cfg["model"]["token_embeds_array"] = te

    # ---------------------------------------------------------------- method
    def _build_method(self):
        cfg = self.config
        try:
            self.codebook = prepare_codebook(self.method, cfg, self.logdir)
        except Exception as e:
            logging.warning("codebook stage failed (%s); offline fallback", e)
            from concepthash_tpu.data.manifest import read_class_names
            from concepthash_tpu.models.backbone_factory import (
                vision_config_from_backbone_cfg,
            )

            root = os.path.join(cfg.get("data_dir", "."),
                                cfg["dataset"]["data_folder"])
            names = read_class_names(root)
            # fallback embedding width: explicit center_dim, else the
            # image-text joint width of the configured backbone
            dim = int(cfg["model"].get("center_dim", 0) or
                      vision_config_from_backbone_cfg(
                          cfg.get("backbone", {}) or {}).projection_dim)
            self.codebook = prepare_codebook(
                self.method, cfg, self.logdir,
                text_embedder=lambda n: offline_text_embedder(n, dim=dim))
        if cfg["model"].get("filip"):
            self._prepare_filip_tokens()
        self.model = self.method.build_model(cfg, self.codebook)
        self.loss_fn = self.method.build_loss(cfg, self.codebook)

        epochs = int(cfg.get("epochs", 100))
        steps_per_epoch = max(len(self.loaders["train"]), 1)
        bs = int(cfg.get("batch_size", 64))
        sample = jnp.zeros((bs, self.crop, self.crop, 3), jnp.float32)
        rng = jax.random.PRNGKey(int(cfg.get("seed", 42)))
        init_vars = self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            sample, train=True)
        init_params = init_vars["params"]

        from concepthash_tpu.models.backbone_factory import maybe_load_pretrained_vision

        # codebook-before-model, pretrained overlay after init (explicit stage)
        loaded = maybe_load_pretrained_vision(cfg.get("backbone", {}) or {},
                                              init_params)

        self.tx = build_optimizer(
            cfg.get("optim", {}) or {}, cfg.get("scheduler", {}) or {},
            epochs, steps_per_epoch, init_params,
            backbone_lr_scale=float(cfg.get("backbone_lr_scale", 1.0)))
        # reuse the init above (same rng derivation) — a second full
        # model.init costs minutes for ViT-B-sized models on a 1-core host
        self.state = create_train_state(self.model, self.tx, sample, rng,
                                        variables=init_vars)
        if loaded is not init_params:
            self.state = self.state.replace(params=loaded)
        self.state = replicate(self.state, self.mesh)

        out_attn = self.method.needs_attentions(cfg)

        def train_pp(images, prng):
            if self.method.two_view:
                # contrastive methods train on two augmentations per image
                # (reference trainers/base_contrastive.py:6-47)
                k1, k2 = jax.random.split(prng)
                v1 = preprocess_batch(images, k1, crop=self.crop,
                                      norm=self.norm, train=True,
                                      augment=self.augment)
                v2 = preprocess_batch(images, k2, crop=self.crop,
                                      norm=self.norm, train=True,
                                      augment=self.augment)
                return jnp.concatenate([v1, v2], axis=0)
            return preprocess_batch(images, prng, crop=self.crop,
                                    norm=self.norm, train=True,
                                    augment=self.augment)

        def eval_pp(images, _rng):
            return preprocess_batch(images, jax.random.PRNGKey(0),
                                    crop=self.crop, norm=self.norm, train=False)

        if self.method.init_extra is not None:
            self.state = jax.device_get(self.state)
            self.state = self.method.init_extra(self.state, cfg)
            self.state = replicate(self.state, self.mesh)
        self.train_multi_step = None
        chunk = cfg.get("train_chunk", "auto")
        if chunk in ("auto", None):  # amortize relay dispatch on TPU only
            chunk = 8 if jax.default_backend() == "tpu" else 1
        self.train_chunk = max(1, int(chunk))
        if self.method.custom_step is not None:
            self.train_step = self.method.custom_step(
                self.model, cfg, self.tx, train_pp,
                epochs * steps_per_epoch)
        elif self.method.regime in ("sgd", "odc"):
            self.train_step = make_train_step(
                self.model, self.loss_fn, self.tx, mesh=self.mesh,
                output_attentions=out_attn, preprocess_fn=train_pp)
            if self.train_chunk > 1:
                # K steps per dispatch (lax.scan) — amortizes the per-step
                # relay dispatch that dominates small-model TPU steps.
                self.train_multi_step = make_multi_train_step(
                    self.model, self.loss_fn, self.tx, mesh=self.mesh,
                    output_attentions=out_attn, preprocess_fn=train_pp)
        self.eval_step = make_eval_step(self.model, self.loss_fn,
                                        mesh=self.mesh, preprocess_fn=eval_pp)
        self.eval_multi_step = None
        if self.train_chunk > 1:
            self.eval_multi_step = make_multi_eval_step(
                self.model, self.loss_fn, mesh=self.mesh, preprocess_fn=eval_pp)
        self.epochs = epochs
        self.steps_per_epoch = steps_per_epoch

    # ------------------------------------------------------------------ train
    def _extract_train_matrix(self, encode_batch) -> np.ndarray:
        """(Ntrain, D) matrix extracted in DATASET order — unshuffled
        drop_last=False loader, rows scattered by batch index, pad tail
        masked by n_valid. The shared contract for the SSDH structure, the
        ODC memory seeding, and the shallow fit; ``encode_batch(batch, i)``
        returns the (bs, D) codes for loader batch i."""
        n = len(self.datasets["train"])
        bs = int(self.config.get("batch_size", 64))
        feats = None
        loader = Loader(self.datasets["train"], bs, shuffle=False,
                        drop_last=False, **self._loader_kw)
        for i, batch in enumerate(loader):
            nv = batch.pop("n_valid")
            arr = np.asarray(encode_batch(batch, i))[:nv]
            if feats is None:
                feats = np.zeros((n, arr.shape[1]), np.float32)
            feats[batch["index"][:nv]] = arr
        return feats

    def _eval_codes_batch(self, batch, _i=None):
        codes, _ = self.eval_step(self.state, shard_batch(batch, self.mesh))
        return codes["codes"]

    def _prepare_structure(self):
        """SSDH: build the pairwise semantic structure from initial features
        (reference trainers/ssdh.py:9-12 precomputes before epoch 1).

        Extracted in DATASET order (unshuffled drop_last=False loader,
        rows scattered by batch index, like _odc_setup): the structure is
        later indexed by dataset index (train_one_epoch's
        ``self._structure[np.ix_(idx, idx)]``), so an encode over the
        shuffled drop_last train loader would pair wrong samples — and
        IndexError on the dropped tail."""
        from concepthash_tpu.losses.unsupervised import ssdh_structure

        feats = self._extract_train_matrix(self._eval_codes_batch)
        alpha = float((self.config.get("criterion") or {}).get("alpha", 2.0))
        self._structure = ssdh_structure(feats, alpha=alpha)
        logging.info("ssdh structure: %.1f%% positive, %.1f%% negative",
                     100 * (self._structure > 0).mean(),
                     100 * (self._structure < 0).mean())

    def _odc_setup(self):
        """Seed the ODC memory (reference prepare_before_first_epoch,
        trainers/odc.py:105-121): extract every train code in dataset order,
        k-means into nclass clusters (sklearn; reference uses faiss niter=50),
        and load features/labels/centroids/weights into TrainState.extra for
        the on-device online updates (_odc_step)."""
        from sklearn.cluster import KMeans

        n = len(self.datasets["train"])
        k = int(self.config["model"]["nclass"])
        feats = self._extract_train_matrix(self._eval_codes_batch)
        feats /= np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
        km = KMeans(n_clusters=k, n_init=3,
                    random_state=int(self.config.get("seed", 42))).fit(feats)
        labels = km.labels_.astype(np.int32)
        counts = np.bincount(labels, minlength=k).astype(np.float32)
        rw = np.where(counts > 0, 1.0 / np.sqrt(np.maximum(counts, 1.0)), 0.0)
        rw = rw / max(rw.sum() / max((counts > 0).sum(), 1), 1e-12)
        extra = {"features": feats,
                 "labels": labels,
                 "centroids": km.cluster_centers_.astype(np.float32),
                 "weights": rw.astype(np.float32)}
        self.state = self.state.replace(extra=replicate(extra, self.mesh))
        logging.info("odc: initial k-means into %d clusters (largest %.1f%%)",
                     k, 100 * counts.max() / max(n, 1))

    def train_one_epoch(self, ep: int) -> dict:
        if self.method.needs_structure and not hasattr(self, "_structure"):
            self._prepare_structure()
        if self.method.regime == "odc" and "features" not in (
                self.state.extra or {}):
            self._odc_setup()  # one-time memory init; updates run in-step
        meters = MeterBank()
        t0 = time.time()
        pending: list[tuple[dict, int]] = []  # (batch, n_valid) awaiting a chunk

        def run_chunk():
            batches = self._stack_chunk([b for b, _ in pending])
            self.profiler.step_start()
            self.state, metrics = self.train_multi_step(
                self.state, self._place_chunk(batches))
            self.profiler.step_end()
            meters.update_device(metrics, [n for _, n in pending])
            pending.clear()

        for batch in self.loaders["train"]:
            n = batch.pop("n_valid")
            if self.method.needs_structure:
                idx = batch["index"]
                batch["aux"] = self._structure[np.ix_(idx, idx)]
            if self.train_multi_step is not None:
                pending.append((batch, n))
                if len(pending) == self.train_chunk:
                    run_chunk()
                continue
            self.profiler.step_start()
            self.state, metrics = self.train_step(self.state,
                                                  shard_batch(batch, self.mesh))
            self.profiler.step_end()
            meters.update_device(metrics, n)
        for batch, n in pending:  # tail < chunk: single-step path
            self.profiler.step_start()
            self.state, metrics = self.train_step(self.state,
                                                  shard_batch(batch, self.mesh))
            self.profiler.step_end()
            meters.update_device(metrics, n)
        pending.clear()
        res = meters.materialize()
        res["time"] = time.time() - t0
        res["lr"] = current_lr(self.config.get("optim", {}) or {},
                               self.config.get("scheduler", {}) or {},
                               self.epochs, self.steps_per_epoch,
                               int(jax.device_get(self.state.step)))
        return res

    def _stack_chunk(self, items: list) -> dict:
        """Stack K per-batch dicts into (K, ...) arrays, REUSING preallocated
        buffers across chunks. Fresh ~200MB allocations per chunk page-fault
        erratically on lazily-backed VM memory (measured 0.07s-33s for the
        same np.stack on this host) and churn the allocator everywhere else.

        DOUBLE-buffered (two buffers per key, alternating) and FENCED:
        JAX/PJRT does not guarantee the host buffer is consumed before
        device_put returns (H2D transfers are async and the CPU backend may
        zero-copy alias numpy buffers), and dispatches queue without
        bounding how many transfers are in flight — so before refilling a
        buffer we block_until_ready the device arrays placed from it two
        chunks ago (recorded by _place_chunk). At steady state that
        transfer completed long ago and the wait is free; the fence only
        bites when the host outruns the device by >2 chunks — exactly when
        the old code could have corrupted a batch."""
        bufs = getattr(self, "_chunk_bufs", None)
        if bufs is None:
            bufs = self._chunk_bufs = {}
            self._chunk_flip = 0
            self._chunk_inflight = {}
        self._chunk_flip ^= 1
        prev = self._chunk_inflight.pop(self._chunk_flip, None)
        if prev is not None:
            jax.block_until_ready(prev)
        out = {}
        for k in items[0]:
            arrs = [np.asarray(b[k]) for b in items]
            key = (k, len(arrs), arrs[0].shape, arrs[0].dtype.str,
                   self._chunk_flip)
            buf = bufs.get(key)
            if buf is None:
                buf = bufs[key] = np.empty((len(arrs),) + arrs[0].shape,
                                           arrs[0].dtype)
            np.stack(arrs, out=buf)
            out[k] = buf
        return out

    def _place_chunk(self, batches: dict) -> dict:
        """Device-place a stacked chunk and record the placed arrays against
        the buffer generation that produced them (the _stack_chunk fence)."""
        placed = shard_batch_chunk(batches, self.mesh)
        self._chunk_inflight[self._chunk_flip] = placed
        return placed

    # ------------------------------------------------------------------- eval
    def encode_split(self, split: str):
        """Encode a split; returns ({codes_key: (N, nbit)}, labels, meters).

        Full batches are scan-chunked (train_chunk batches per device
        dispatch, make_multi_eval_step) — database extraction dominates every
        evaluation epoch and pays the same per-dispatch latency the train
        loop did."""
        all_codes: dict[str, list] = {}
        labels = []
        meters = MeterBank()
        bs = int(self.config.get("batch_size", 64))
        pending: list[tuple[dict, int]] = []

        def flush_chunk():
            batches = self._stack_chunk([b for b, _ in pending])
            codes_k, metrics_k = self.eval_multi_step(
                self.state, self._place_chunk(batches))
            ns = [n for _, n in pending]
            if metrics_k:
                meters.update_device(metrics_k, ns)
            for k, v in codes_k.items():
                arr = np.asarray(v)  # (K, B, nbit)
                for i, n in enumerate(ns):
                    all_codes.setdefault(k, []).append(arr[i, :n])
            for (b, n) in pending:
                labels.append(b["label"][:n])
            pending.clear()

        def run_single(batch, n):
            if n == bs:
                codes, metrics = self.eval_step(self.state,
                                                shard_batch(batch, self.mesh))
            else:
                # Tail batch: evaluate exactly the n valid rows so padded
                # zeros never enter the loss/accuracy meters — the reference
                # includes the variable last batch in its meters
                # (trainers/base.py:275-307). Costs one extra jit trace per
                # distinct tail size (once per run; unsharded placement —
                # n may not divide the mesh).
                tail = {k: (v[:n] if isinstance(v, np.ndarray)
                            and v.ndim >= 1 and len(v) == bs else v)
                        for k, v in batch.items()}
                codes, metrics = self.eval_step(self.state, tail)
            if metrics:
                meters.update_device(metrics, n)
            for k, v in codes.items():
                all_codes.setdefault(k, []).append(np.asarray(v)[:n])
            labels.append(batch["label"][:n])

        use_chunk = getattr(self, "eval_multi_step", None) is not None \
            and self.train_chunk > 1
        for batch in self.loaders[split]:
            n = batch.pop("n_valid")
            if use_chunk and n == bs:
                pending.append((batch, n))
                if len(pending) == self.train_chunk:
                    flush_chunk()
                continue
            # leftovers shorter than the chunk go through the single-step
            # path (a shorter scan would force a fresh compile per length)
            for (b2, n2) in pending:
                run_single(b2, n2)
            pending.clear()
            run_single(batch, n)
        for (b2, n2) in pending:
            run_single(b2, n2)
        pending.clear()
        return ({k: np.concatenate(v) for k, v in all_codes.items()},
                np.concatenate(labels), meters.materialize())

    def evaluation(self, ep: int) -> dict:
        cfg = self.config
        test_codes, test_labels, test_meters = self.encode_split("test")
        db_codes, db_labels, _ = self.encode_split("db")
        res = {"ep": ep, **{f"test_{k}": v for k, v in test_meters.items()}}
        for key in test_codes:
            postfix = "" if key == "codes" else "_" + key.split("_", 1)[0]
            mAP, recalls, precisions = calculate_mAP(
                db_codes[key], db_labels, test_codes[key], test_labels,
                R=cfg.get("dataset", {}).get("R", -1),
                dist_metric=cfg.get("dist_metric", "hamming"),
                PRs=tuple(cfg.get("PRs", (1, 5, 10))),
                zero_mean=bool(cfg.get("zero_mean_eval", False)))
            res["mAP" + postfix] = mAP
            res["recalls" + postfix] = recalls
            res["precisions" + postfix] = precisions
        # pseudo-label quality for cluster-based methods (reference
        # train_helper.py:243-251): nearest-centroid assignment of the
        # L2-normalized codes (the same rule _odc_step reassigns with)
        # scored by NMI against ground truth, per split.
        extra = getattr(self.state, "extra", None) or {}
        if self.method.regime == "odc" and "centroids" in extra:
            from concepthash_tpu.ops.retrieval import normalized_mutual_info

            cents = np.asarray(jax.device_get(extra["centroids"]))
            for name, codes, labels in (("test", test_codes, test_labels),
                                        ("db", db_codes, db_labels)):
                c = np.asarray(codes["codes"], np.float32)
                c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                                1e-12)
                # (N,k) expansion, not the (N,k,nbit) broadcast (which
                # materializes ~38GB at 100k rows x 1486 classes x 64 bit)
                d2 = ((c ** 2).sum(1, keepdims=True)
                      - 2.0 * c @ cents.T + (cents ** 2).sum(1))
                pseudo = d2.argmin(1)
                gt = labels.argmax(1) if labels.ndim > 1 else labels
                res[f"{name}_nmi"] = normalized_mutual_info(gt, pseudo)
                logging.info("%s NMI: %.4f", name, res[f"{name}_nmi"])
        logging.info("ep %d eval: mAP=%s", ep, res.get("mAP"))
        return res, (test_codes, test_labels, db_codes, db_labels)

    # ------------------------------------------------------------- checkpoint
    def model_state_blob(self, ep: int) -> dict:
        s = jax.device_get(self.state)
        return {"params": s.params, "batch_stats": s.batch_stats,
                "constants": s.constants, "epoch": ep}

    def save_model(self, name: str, ep: int):
        io.fast_save(self.model_state_blob(ep),
                     os.path.join(self.logdir, "models", f"{name}.msgpack"))
        if self.config.get("save_training_state", False):
            s = jax.device_get(self.state)
            io.fast_save({"opt_state": s.opt_state, "step": s.step,
                          "rng": s.rng, "epoch": ep},
                         os.path.join(self.logdir, "optims", f"{name}.msgpack"))

    def load_model_state(self, path: str):
        blob = io.load_checkpoint(path)
        if "params" not in blob:
            # shallow-regime checkpoints hold {'criterion': fit_state} —
            # not a network state; fail with the cause, not a KeyError
            raise ValueError(
                f"{path} is not a network checkpoint (keys: "
                f"{sorted(blob)}); shallow-method runs (itq/pca/lsh/sh) "
                f"store the fitted criterion, which exp=validation cannot "
                f"re-evaluate as a model")
        s = jax.device_get(self.state)
        self.state = self.state.replace(
            params=_restore_like(s.params, blob["params"]),
            batch_stats=_restore_like(s.batch_stats, blob.get("batch_stats", {})),
            constants=_restore_like(s.constants, blob.get("constants", {})))
        self.state = replicate(self.state, self.mesh)
        return int(blob.get("epoch", 0))

    def finetune_init(self, path: str):
        """Initialize model weights from another run before training —
        fresh optimizer/step/history (reference train_helper.py:89-91
        ``trainer.finetune_setup(config.finetune_path)`` +
        configs/train.yaml:43). Accepts a checkpoint file or a run dir
        (best.msgpack preferred, then last.msgpack). Leaves with mismatched
        shapes (e.g. a head re-targeted to a new nclass, finetune_reset
        semantics) keep their fresh init."""
        if os.path.isdir(path):
            for name in ("best.msgpack", "last.msgpack"):
                cand = os.path.join(path, "models", name)
                if os.path.exists(cand):
                    path = cand
                    break
        if not os.path.exists(path):
            raise FileNotFoundError(f"finetune_path: no checkpoint at {path}")
        blob = io.load_checkpoint(path)
        s = jax.device_get(self.state)
        params, n_ok, n_skip = _restore_partial(s.params, blob["params"])
        bs, ok2, skip2 = _restore_partial(s.batch_stats,
                                          blob.get("batch_stats", {}))
        cs, ok3, skip3 = _restore_partial(s.constants,
                                          blob.get("constants", {}))
        self.state = self.state.replace(params=params, batch_stats=bs,
                                        constants=cs)
        self.state = replicate(self.state, self.mesh)
        logging.info("finetune: loaded %d tensors from %s (%d kept fresh "
                     "init); optimizer state starts fresh",
                     n_ok + ok2 + ok3, path, n_skip + skip2 + skip3)

    def resume_training(self, resume_logdir: str):
        last = os.path.join(resume_logdir, "models", "last.msgpack")
        if not os.path.exists(last):
            logging.warning("resume requested but %s missing", last)
            return
        ep = self.load_model_state(last)
        opt = os.path.join(resume_logdir, "optims", "last.msgpack")
        if os.path.exists(opt):
            blob = io.load_checkpoint(opt)
            s = jax.device_get(self.state)
            self.state = self.state.replace(
                opt_state=_restore_like(s.opt_state, blob["opt_state"]),
                step=jnp.asarray(blob["step"]), rng=jnp.asarray(blob["rng"]))
            self.state = replicate(self.state, self.mesh)
        for h in (self.train_history, self.test_history):
            src = os.path.join(resume_logdir, os.path.basename(h.path))
            if os.path.exists(src):
                import json

                with open(src) as f:
                    h.history = json.load(f)
        self.start_epoch = ep + 1
        ms = [r.get(self.eval_metric) for r in self.test_history.history
              if r.get(self.eval_metric) is not None]
        # min() for lower-is-better metrics (GeneralExperiment's test_loss):
        # max() would resume with the WORST historical value as "best" and
        # let a mediocre next eval overwrite models/best.msgpack
        self.best_metric = ((max(ms) if self.higher_is_better else min(ms))
                            if ms else None)
        logging.info("resumed from %s at epoch %d", resume_logdir, self.start_epoch)

    # ------------------------------------------------------------------- main
    def main(self):
        if self.method.regime == "shallow":
            return self._main_shallow()
        if self.method.regime == "adsh":
            return self._main_adsh()
        from concepthash_tpu.utils.diagnostics import guarded_training

        cfg = self.config
        eval_interval = int(cfg.get("eval_interval", 10))
        save_interval = int(cfg.get("save_interval", 0))
        with guarded_training() as guard:
            for ep in range(self.start_epoch, self.epochs):
                train_res = self.train_one_epoch(ep)
                self.train_history.append({"ep": ep, **train_res})
                logging.info("ep %d train: loss=%.4f (%.1fs, lr %.2e)", ep,
                             train_res.get("loss", float("nan")),
                             train_res["time"], train_res["lr"])
                is_last = ep == self.epochs - 1
                if is_last or (eval_interval > 0 and
                               (ep + 1) % eval_interval == 0):
                    res, dumps = self.evaluation(ep)
                    self.test_history.append(res)
                    metric = res.get(self.eval_metric)
                    better = (metric is not None and
                              (self.best_metric is None or
                               (metric > self.best_metric
                                if self.higher_is_better
                                else metric < self.best_metric)))
                    if better:
                        self.best_metric = metric
                        self.save_model("best", ep)
                        self._dump_codes(dumps)
                self.save_model("last", ep)
                if save_interval and (ep + 1) % save_interval == 0:
                    self.save_model(f"ep{ep + 1}", ep)
                if guard.should_stop:  # preemption: checkpointed; stop clean
                    logging.warning("stopping at epoch %d (preemption); "
                                    "resume with resume_logdir=%s", ep,
                                    self.logdir)
                    break
        self.profiler.close()
        io.join_save_queue()
        logging.info("done: best %s = %s", self.eval_metric, self.best_metric)
        return self.best_metric

    def _dump_codes(self, dumps):
        test_codes, test_labels, db_codes, db_labels = dumps
        io.fast_save({"codes": test_codes["codes"], "labels": test_labels},
                     os.path.join(self.logdir, "outputs", "test_best.msgpack"))
        io.fast_save({"codes": db_codes["codes"], "labels": db_labels},
                     os.path.join(self.logdir, "outputs", "db_best.msgpack"))

    # -------------------------------------------------------- shallow regime
    def _extract_fit_features(self) -> np.ndarray:
        """(Ntrain, D) feature matrix for the shallow fit, extracted through
        the TRAIN preprocessing (random crop/flip/augment), dataset order,
        no tail drop.

        The reference's shallow trainers fit on the augmented train-loader
        output (trainers/shallow.py:104-121 iterates dataloader['train'],
        whose transform stack includes the train augmentation). This is
        load-bearing, not cosmetic: backbone feature spectra are
        near-degenerate (2 components carry ~97% variance on the parity
        fixture), so a fit on deterministic center-crop features locks onto
        augmentation-sensitive directions — measured −0.17 mAP vs the
        reference's augmented fit with otherwise identical features and an
        SVD that matches sklearn to |cos|=1 per component (parity pca row).
        Deterministic given the run seed (per-batch fold_in)."""
        crop, norm, augment = self.crop, self.norm, self.augment
        model = self.model

        @jax.jit
        def encode(state, images, prng):
            x = preprocess_batch(images, prng, crop=crop, norm=norm,
                                 train=True, augment=augment)
            return model.apply(state.variables(), x, train=False)["codes"]

        rng = jax.random.PRNGKey(int(self.config.get("seed", 42)))
        return self._extract_train_matrix(
            lambda batch, i: encode(self.state, batch["image"],
                                    jax.random.fold_in(rng, i)))

    def _main_shallow(self):
        """One-pass fit (reference trainers/shallow.py:104-121): extract
        features through the train augmentation, fit ITQ/PCA/LSH/SH, encode
        test/db with the eval pipeline, score."""
        from concepthash_tpu.losses.shallow import FITTERS, encode_shallow

        name = self.config["model"]["name"]
        fit_feats = self._extract_fit_features()
        fit_kwargs = dict(self.config.get("criterion", {}) or {})
        fit_kwargs.pop("name", None)
        fit_state = FITTERS[name](fit_feats, int(self.config["model"]["nbit"]),
                                  **fit_kwargs)
        io.fast_save({"criterion": fit_state, "epoch": 0},
                     os.path.join(self.logdir, "models", "best.msgpack"))
        test_feats, test_labels, _ = self.encode_split("test")
        db_feats, db_labels, _ = self.encode_split("db")
        test_codes = encode_shallow(fit_state, test_feats["codes"])
        db_codes = encode_shallow(fit_state, db_feats["codes"])
        mAP, recalls, precisions = calculate_mAP(
            db_codes, db_labels, test_codes, test_labels,
            R=self.config.get("dataset", {}).get("R", -1),
            PRs=tuple(self.config.get("PRs", (1, 5, 10))))
        res = {"ep": 0, "mAP": mAP, "recalls": recalls, "precisions": precisions}
        self.test_history.append(res)
        self.best_metric = mAP
        io.join_save_queue()
        logging.info("shallow %s: mAP=%.4f", name, mAP)
        return mAP

    # ----------------------------------------------------------- adsh regime
    def _main_adsh(self):
        """Alternating optimization (reference trainers/adsh.py:118-175):
        per epoch, SGD a resampled subset against stored db codes, then
        discrete-cyclic-coordinate update of the db codes."""
        from concepthash_tpu.losses.baselines import (adsh_loss, soften_sim,
                                                      solve_dcc)
        from concepthash_tpu.ops.retrieval import get_sim

        cfg = self.config
        crit = dict(cfg.get("criterion", {}) or {})
        gamma = float(crit.get("gamma", 200.0))
        nbit = int(cfg["model"]["nbit"])
        num_samples = int(crit.get("num_samples", 2000))
        inner_epochs = int(crit.get("max_iters", crit.get("inner_epochs", 3)))
        train_ds = self.datasets["train"]
        n_train = len(train_ds)
        num_samples = min(num_samples, n_train)
        rng = np.random.default_rng(int(cfg.get("seed", 42)))
        train_onehot = train_ds.onehot_labels()
        V = np.sign(rng.standard_normal((n_train, nbit))).astype(np.float32)

        bs = int(cfg.get("batch_size", 64))
        resize = int(cfg["dataset"].get("resize", 256))

        def train_pp(images, prng):
            return preprocess_batch(images, prng, crop=self.crop, norm=self.norm,
                                    train=True, augment=self.augment)

        # SEMICON's sub-codes are already tanh-activated in the model
        # (reference models/arch/semicon.py:479-481); csq-style heads emit
        # raw logits that the objective squashes
        pre_act = bool(getattr(self.model, "codes_activated", False))

        def act(x):
            return x if pre_act else np.tanh(x)

        def loss_fn(outputs, batch):
            return adsh_loss(outputs, batch["adsh"], gamma=gamma, nbit=nbit,
                             apply_tanh=not pre_act)

        # self.tx's LR schedule was sized to the FULL train loader in
        # _build_method, but adsh takes inner_epochs * (num_samples // bs)
        # steps per outer epoch — left as-is, cosine/step decay would end
        # the run only ~60% through its horizon (reference trainers/adsh.py
        # schedules on its own step count). Rebuild on the real count; the
        # optimizer chain is unchanged so the existing opt_state fits.
        adsh_steps = max(1, inner_epochs * (num_samples // bs))
        if adsh_steps != self.steps_per_epoch:
            self.tx = build_optimizer(
                cfg.get("optim", {}) or {}, cfg.get("scheduler", {}) or {},
                self.epochs, adsh_steps, jax.device_get(self.state).params,
                backbone_lr_scale=float(cfg.get("backbone_lr_scale", 1.0)))
            self.steps_per_epoch = adsh_steps
        step = make_train_step(self.model, loss_fn, self.tx, mesh=self.mesh,
                               preprocess_fn=train_pp, donate=False)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        data_sh = NamedSharding(self.mesh, P("data"))

        for ep in range(self.epochs):
            omega = rng.choice(n_train, num_samples, replace=False)
            sub = train_ds.subset(omega)
            loader = Loader(sub, bs, shuffle=True, drop_last=True,
                            seed=int(cfg.get("seed", 42)) + ep,
                            **self._loader_kw)
            # Hard {-1,+1} pair matrix, then the upstream soft-similarity
            # rebalance — omitting it collapsed adsh at the 24-class medium
            # parity scale (RESULTS_MULTISEED_MEDIUM pre-fix: 0.44 vs ref
            # 0.84); see soften_sim's docstring. Both the SGD loss and the
            # DCC consume the soft S upstream.
            S_full = soften_sim(get_sim(train_onehot[omega], train_onehot)
                                .astype(np.float32) * 2 - 1)
            V_dev = jax.device_put(V, repl)
            meters = MeterBank()
            for _ in range(inner_epochs):
                for batch in loader:
                    n = batch.pop("n_valid")
                    # loader indices are positions within the subset == omega rows
                    pos = batch["index"]  # (bs,) subset-relative (drop_last: all valid)
                    batch2 = {
                        "image": jax.device_put(batch["image"], data_sh),
                        "label": jax.device_put(batch["label"], data_sh),
                        "adsh": {
                            "S": jax.device_put(S_full[pos], data_sh),
                            "V": V_dev,
                            "V_omega": jax.device_put(V[omega[pos]], data_sh),
                        },
                    }
                    self.state, metrics = step(self.state, batch2)
                    meters.update_device(metrics, n)
            # refresh U on the subset, then DCC-update V
            sub_loader = Loader(sub, bs, **self._loader_kw)
            us, sub_pos = [], []
            for batch in sub_loader:
                n = batch.pop("n_valid")
                codes, _ = self.eval_step(self.state, shard_batch(batch, self.mesh))
                us.append(act(np.asarray(codes["codes"])[:n]))
                sub_pos.append(batch["index"][:n])
            U = np.concatenate(us)
            sub_pos = np.concatenate(sub_pos)  # positions within omega
            # DCC consumes the CONTINUOUS tanh codes (reference
            # trainers/adsh.py:170-173 passes self.U unsigned — magnitude
            # carries confidence into the bit updates; signing first lost
            # it and contributed to the round-3 multiseed collapse)
            V = np.asarray(solve_dcc(jnp.asarray(V), jnp.asarray(U),
                                     jnp.asarray(S_full[sub_pos]),
                                     jnp.asarray(omega[sub_pos]), gamma, nbit))
            res = meters.materialize()
            self.train_history.append({"ep": ep, **res})
            logging.info("adsh ep %d: loss=%.4f", ep, res.get("loss", float("nan")))

        # db codes are the stored V (reference adsh.py:78-79)
        self._adsh_V = V
        test_codes, test_labels, _ = self.encode_split("test")
        mAP, recalls, precisions = calculate_mAP(
            V, train_onehot, act(test_codes["codes"]), test_labels,
            R=cfg.get("dataset", {}).get("R", -1),
            PRs=tuple(cfg.get("PRs", (1, 5, 10))))
        self.test_history.append({"ep": self.epochs - 1, "mAP": mAP,
                                  "recalls": recalls, "precisions": precisions})
        self.save_model("best", self.epochs - 1)
        io.fast_save({"V": V}, os.path.join(self.logdir, "outputs", "db_codes.msgpack"))
        io.join_save_queue()
        self.best_metric = mAP
        logging.info("adsh: mAP=%.4f", mAP)
        return mAP


class GeneralExperiment(RetrievalExperiment):
    """No-mAP variant: best = min test loss (reference
    experiments/train_no_eval.py:11-88)."""

    eval_metric = "test_loss"
    higher_is_better = False

    def evaluation(self, ep: int):
        _, _, test_meters = self.encode_split("test")
        res = {"ep": ep, **{f"test_{k}": v for k, v in test_meters.items()}}
        res["test_loss"] = res.get("test_loss", test_meters.get("loss", 0.0))
        return res, None

    def _dump_codes(self, dumps):
        pass


class RetrievalEvaluation:
    """Eval-only: load a checkpoint, encode, score — incl. sub-code slicing,
    zero-mean, ternary threshold, test-as-database, PR curves, code export
    (reference experiments/test_hashing.py:18-181)."""

    def __init__(self, config: dict):
        self.config = config
        # reuse the experiment plumbing without its training state
        self.exp = RetrievalExperiment.__new__(RetrievalExperiment)
        exp = self.exp
        exp.config = config
        exp.logdir = config["logdir"]
        self.eval_logdir = config.get("eval_logdir",
                                      os.path.join(exp.logdir, "evaluations"))
        os.makedirs(self.eval_logdir, exist_ok=True)
        io.init_save_queue()
        setup_logging(os.path.join(self.eval_logdir, "log.txt"))
        seeding(int(config.get("seed", 42)))
        exp.method = get_method(config["model"]["name"])
        exp.multiclass = bool(config.get("dataset", {}).get("multiclass", False))
        exp._load_data()
        exp._build_method()
        name = "last" if config.get("use_last") else "best"
        path = os.path.join(exp.logdir, "models", f"{name}.msgpack")
        if os.path.exists(path):
            exp.load_model_state(path)
        else:
            logging.warning("checkpoint %s missing — evaluating current init", path)

    def main(self) -> dict:
        cfg = self.config
        exp = self.exp
        test_codes, test_labels, test_meters = exp.encode_split("test")
        res = {f"test_{k}": v for k, v in test_meters.items()}

        if cfg.get("exp") == "extract" or cfg.get("save_code"):
            io.fast_save({"test": {**test_codes, "labels": test_labels}},
                         os.path.join(self.eval_logdir, "outputs.msgpack"))
        if cfg.get("exp") == "extract":
            io.join_save_queue()
            return res

        if cfg.get("test_as_database"):
            db_codes, db_labels = test_codes, test_labels
            drop_first = True
        else:
            db_codes, db_labels, _ = exp.encode_split("db")
            drop_first = False

        for key in test_codes:
            postfix = "" if key == "codes" else "_" + key.split("_", 1)[0]
            tc, dc = test_codes[key], db_codes[key]
            if cfg.get("sub_code_eval"):
                s = cfg.get("sub_code_eval_setting", {}) or {}
                if int(s.get("rand_bits", 0)):
                    rng = np.random.default_rng(int(cfg.get("seed", 42)))
                    bits = rng.permutation(tc.shape[1])[:int(s["rand_bits"])]
                else:
                    end = int(s.get("end_bit", -1))
                    if end < 0:
                        end = tc.shape[1]
                    bits = np.arange(int(s.get("start_bit", 0)), end)
                tc, dc = tc[:, bits], dc[:, bits]
            common = dict(dist_metric=cfg.get("dist_metric", "hamming"),
                          threshold=float(cfg.get("ternary_threshold", 0) or 0),
                          remove_first_retrieved=drop_first)
            # cutoff precedence: an explicit top-level R override wins, else
            # the dataset group's R (inat_birds sets R: 1000 there) — the
            # old top-level-only read made eval-only score mAP@-1 on runs
            # whose training evals reported mAP@1000
            R_cfg = cfg.get("R", -1)
            if R_cfg in (-1, None) and isinstance(cfg.get("dataset"), dict):
                R_cfg = cfg["dataset"].get("R", -1)
            if cfg.get("compute_mAP", True):
                mAPs, recalls, precisions = calculate_mAP(
                    dc, db_labels, tc, test_labels, R=R_cfg,
                    PRs=tuple(cfg.get("PRs", (1, 5, 10))),
                    zero_mean=bool(cfg.get("zero_mean_eval", False)), **common)
                res["mAP" + postfix] = mAPs
                res["recalls" + postfix] = recalls
                res["precisions" + postfix] = precisions
                logging.info("%s: mAP@%s = %s", key, R_cfg, mAPs)
            else:
                recalls, precisions, Rs = calculate_pr_curve(
                    dc, db_labels, tc, test_labels, **common)
                res["recalls" + postfix] = recalls
                res["precisions" + postfix] = precisions
                res["Rs" + postfix] = Rs

        import json

        with open(os.path.join(self.eval_logdir, "history.json"), "w") as f:
            json.dump(_jsonable(res), f, indent=2)
        io.join_save_queue()
        return res


def _jsonable(x):
    from concepthash_tpu.utils.logger import _to_jsonable

    return _to_jsonable(x)


def _restore_partial(template, data, _stats=None):
    """Lenient restore for finetune init: leaves whose key is missing or
    whose SHAPE differs keep the template's fresh value (mirrors reference
    finetune_reset, models/arch/base.py:61 — a new-nclass head is
    re-initialized while everything else loads). Shape match, not element
    count: a same-numel but transposed/reshaped leaf after an architecture
    tweak must keep the fresh init, not load scrambled weights. Returns
    (tree, n_loaded, n_skipped)."""
    stats = _stats if _stats is not None else [0, 0]
    if isinstance(template, dict):
        out = {}
        for k in template:
            if isinstance(data, dict) and k in data:
                out[k] = _restore_partial(template[k], data[k], stats)[0]
            else:
                out[k] = template[k]
                stats[1] += 1
        return out, stats[0], stats[1]
    if hasattr(template, "shape"):
        arr = None if data is None else np.asarray(data)
        if arr is not None and arr.shape == tuple(np.shape(template)):
            stats[0] += 1
            return (jnp.asarray(arr, dtype=jnp.asarray(template).dtype),
                    stats[0], stats[1])
        stats[1] += 1
        return template, stats[0], stats[1]
    return template if data is None else data, stats[0], stats[1]


def _restore_like(template, data):
    """Restore a msgpack dict onto a pytree template (keeps dtypes/shapes).
    Missing subtrees/keys in ``data`` keep the template's current values
    (the documented lenient default — blob.get(..., {}) call sites).

    Shape mismatches RAISE: strict resume (unlike finetune's
    ``_restore_partial``) must never reshape a same-numel-but-transposed
    leaf into scrambled weights, and silently keeping a fresh init would be
    just as wrong on the resume path (reference resume loads the exact
    state back, experiments/train_helper.py:155-187)."""
    if isinstance(template, dict):
        if not isinstance(data, dict):
            return template
        return {k: _restore_like(template[k], data.get(k)) for k in template}
    if hasattr(template, "shape") and data is not None:
        arr = np.asarray(data)
        want = tuple(np.shape(template))
        if arr.shape != want:
            raise ValueError(
                f"strict resume: checkpoint leaf shape {arr.shape} does not "
                f"match the model's {want}. The architecture changed since "
                "this checkpoint was written — use finetune_path (lenient "
                "restore) instead of resume for architecture changes.")
        return jnp.asarray(arr, dtype=jnp.asarray(template).dtype)
    if isinstance(template, (tuple, list)) or hasattr(template, "_fields"):
        seq = list(data.values()) if isinstance(data, dict) else list(data)
        rebuilt = [_restore_like(t, d) for t, d in zip(template, seq)]
        if hasattr(template, "_fields"):
            return type(template)(*rebuilt)
        return type(template)(rebuilt)
    return template if data is None else data

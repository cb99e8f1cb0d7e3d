"""Method registry: config name -> {model factory, loss fn, codebook needs,
training regime}. The JAX redesign of the reference's trainer-class zoo
(trainers/*.py, SURVEY.md §2.4): method logic is data, the training loop is
generic.

Regimes:
  sgd      — gradient methods through the pjit train step
  shallow  — one-pass fit on extracted features (ITQ/PCA/LSH/SH,
             reference trainers/shallow.py)
  adsh     — alternating optimization with stored database codes
             (reference trainers/adsh.py / semicon.py)
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from concepthash_tpu.losses import baselines as L
from concepthash_tpu.losses.concepthash import lgh_loss
from concepthash_tpu.models.backbone_factory import (
    adapter_config_from_model_cfg,
    vision_config_from_backbone_cfg,
)
from concepthash_tpu.models.baselines import BaselineConfig, BaselineHashNet
from concepthash_tpu.models.concepthash import ConceptHash, ConceptHashConfig


@dataclasses.dataclass
class Method:
    name: str
    build_model: Callable  # (config, codebook) -> nn.Module
    build_loss: Callable   # (config, codebook) -> fn(outputs, batch)->(loss, parts)
    codebook: Optional[str] = None     # None | 'signed' | 'continuous'
    regime: str = "sgd"                # sgd | shallow | adsh | odc
    unsupervised: bool = False
    two_view: bool = False             # train batches = two augmented views
    needs_structure: bool = False      # precompute pairwise structure (SSDH)
    needs_attentions: Callable = lambda cfg: False
    # EMA-teacher pretraining hooks (moco/dino): build a custom jitted step
    # and initialize TrainState.extra
    custom_step: Optional[Callable] = None   # (model, cfg, tx, pp, steps)->fn
    init_extra: Optional[Callable] = None    # (state, cfg) -> state


_REGISTRY: dict[str, Method] = {}


def register_method(m: Method):
    _REGISTRY[m.name] = m
    return m


def get_method(name: str) -> Method:
    if name not in _REGISTRY:
        raise KeyError(f"unknown method {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_methods() -> list:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

def _vision_and_adapters(config):
    vcfg = vision_config_from_backbone_cfg(config.get("backbone", {}) or {})
    acfg = adapter_config_from_model_cfg(config.get("model", {}))
    return vcfg, acfg


def _compute_dtype(config):
    """``compute_dtype: bfloat16`` runs model math on the MXU at full rate
    (params stay float32; codes/logits/centers are cast back to f32 inside
    the models)."""
    name = str(config.get("compute_dtype", "float32")).lower()
    table = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
             "float32": jnp.float32, "f32": jnp.float32}
    if name not in table:
        raise ValueError(f"compute_dtype {name!r} not supported; "
                         f"use one of {sorted(table)}")
    return table[name]


def _null_loss(config, codebook):
    """Loss for methods trained without an objective (descriptor extraction,
    shallow fits, EMA-pretrain methods whose loss lives in a custom step)."""
    return lambda outputs, batch: (jnp.float32(0.0), {})


def _build_concepthash(config, codebook):
    from concepthash_tpu.models.concepthash import SelfAttnLastConfig

    m = config["model"]
    upt = m.get("upt_config", {}) or {}
    vcfg, acfg = _vision_and_adapters(config)
    sa = m.get("self_attn_at_last") or None
    sa_cfg = SelfAttnLastConfig(
        params=bool(sa.get("params", True)),
        strong=bool(sa.get("strong", False)),
        mask_sigma=float(sa.get("mask_sigma", 0.0)),
        cross_attention=bool(sa.get("cross_attention", False)),
        differentiable=bool(sa.get("differentiable", False)),
        add_pe=bool(sa.get("add_pe", False))) if sa else None
    ccfg = ConceptHashConfig(
        nbit=int(m["nbit"]),
        nclass=int(m["nclass"]),
        ncontext=int(m.get("ncontext", 4)),
        nregs=int(m.get("nregs", 0)),
        num_heads=int(upt.get("num_heads", 8)),
        dropout=float(upt.get("dropout", 0.1)),
        add_bn=m.get("add_bn", True),  # True | False | "dbn"
        use_before_projection=bool(m.get("use_before_projection", True)),
        hash_pe=bool(upt.get("hash_pe", True)),
        ensemble_method=upt.get("ensemble_method", "concat"),
        concept_reg=bool(m.get("concept_reg", True)),
        concept_cossim=bool(m.get("concept_cossim", True)),
        vpt_pe=bool(m.get("vpt_pe", False)),
        learnable_center=codebook is None,
        center_dim=int(codebook.shape[1]) if codebook is not None else 512,
        text_projection_dims=tuple(m.get("text_projection_dims", (512,))),
        self_attn_at_last=sa_cfg,
    )
    fixed = jnp.asarray(codebook) if codebook is not None else None
    te = m.get("token_embeds_array")  # injected by the experiment's FILIP stage
    return ConceptHash(vcfg, ccfg, adapters=acfg, fixed_center=fixed,
                       token_embeds=jnp.asarray(te) if te is not None else None,
                       dtype=_compute_dtype(config))


def _build_baseline(head, config, codebook, **kw):
    m = config["model"]
    vcfg, acfg = _vision_and_adapters(config)
    bcfg = BaselineConfig(nbit=int(m["nbit"]), nclass=int(m["nclass"]),
                          head=head, add_bn=bool(m.get("add_bn", True)),
                          ce_cossim=m.get("m_type", "ce") != "ce",
                          latent_dim=int(m.get("latent_dim", 128)),
                          bcs=bool(m.get("bcs", False)),
                          # opt-in biased hash layer: the reference's ADSH
                          # head is Linear(bias)+Tanh (arch/adsh.py:14-17);
                          # pass model.hash_bias=true when importing its
                          # checkpoints (utils/torch_import.py)
                          hash_bias=bool(m.get("hash_bias", False)))
    cb = jnp.asarray(codebook) if codebook is not None else None
    return BaselineHashNet(vcfg, bcfg, adapters=acfg, codebook=cb,
                           backbone_cfg=config.get("backbone"),
                           dtype=_compute_dtype(config), **kw)


def _criterion_kwargs(config):
    crit = dict(config.get("criterion", {}) or {})
    crit.pop("name", None)
    crit.setdefault("multiclass", bool(
        config.get("dataset", {}).get("multiclass", False)))
    return crit


def _simple_loss(loss_fn):
    def build(config, codebook):
        kw = _criterion_kwargs(config)
        if codebook is not None:
            kw["codebook"] = jnp.asarray(codebook)
        return lambda outputs, batch: loss_fn(outputs, batch["label"], **kw)

    return build


def _lgh_build_loss(config, codebook):
    kw = _criterion_kwargs(config)
    kw.pop("multiclass", None)
    kw.setdefault("ncontext", int(config["model"].get("ncontext", 4)))
    kw.setdefault("concept_cossim", bool(config["model"].get("concept_cossim", True)))
    # attn-diversity slices depend on the register-token count
    kw.setdefault("nregs", int(config["model"].get("nregs", 0) or 0))
    # LGHv3 (reference models/loss/coop.py:346-352): contrastive variant —
    # labels are replaced by the batch diagonal (requires logits whose class
    # axis is the batch, i.e. centers = the batch itself)
    v3 = kw.pop("v3", False) or (config.get("criterion", {}) or {}) \
        .get("name") in ("lghv3", "lgh_v3")

    def loss(outputs, batch):
        y = batch["label"]
        if v3:
            y = jnp.eye(y.shape[0], dtype=jnp.float32)
        return lgh_loss(outputs, y, **kw)

    return loss


register_method(Method(
    "concepthash", _build_concepthash, _lgh_build_loss, codebook="continuous",
    needs_attentions=lambda cfg: (((cfg.get("criterion", {}) or {})
                                   .get("loss_scales", {}) or {})
                                  .get("attn_div_loss", 0) != 0)))
register_method(Method(
    "orthohash", functools.partial(_build_baseline, "orthohash"),
    _simple_loss(L.orthohash_loss), codebook="signed"))


def _build_orthohash_bcs(config, codebook, **kw):
    """OrthoHashWithBCS (reference models/arch/orthohash.py:57-63): the
    orthohash net with a second sign-centroid logits head (model.bcs)."""
    config = {**config, "model": {**dict(config["model"]), "bcs": True}}
    return _build_baseline("orthohash", config, codebook, **kw)


register_method(Method(
    "orthohash_bcs", _build_orthohash_bcs,
    _simple_loss(L.orthohash_loss), codebook="signed"))
register_method(Method(
    "csq", functools.partial(_build_baseline, "csq"),
    _simple_loss(L.csq_loss), codebook="signed"))
register_method(Method(
    "dpn", functools.partial(_build_baseline, "dpn"),
    _simple_loss(L.dpn_loss), codebook="signed"))
def _hashnet_step(model, config, tx, preprocess_fn, total_steps):
    """HashNet custom step: beta-continuation schedule
    beta = sqrt(ep // step_continuation + 1) (reference
    trainers/hashnet.py:14-17) and the opt-in keep_train_size memory bank
    U/Y in TrainState.extra (reference models/loss/hashnet.py:36-70)."""
    import optax

    from concepthash_tpu.ops.retrieval import get_sim, log_trick
    from concepthash_tpu.train.state import accuracy_metrics

    crit = dict(config.get("criterion", {}) or {})
    alpha = float(crit.get("alpha", 1.0))
    step_cont = int(crit.get("step_continuation", 20))
    keep = int(crit.get("keep_train_size", 0))
    epochs = int(config.get("epochs", 100))
    steps_per_epoch = max(total_steps // max(epochs, 1), 1)

    def step_fn(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        images = batch["image"]
        if preprocess_fn is not None:
            images = preprocess_fn(images, jax.random.fold_in(rng, 7))
        ep = state.step // steps_per_epoch
        beta = jnp.sqrt(jnp.floor(ep / step_cont) + 1.0).astype(jnp.float32)
        y = batch["label"].astype(jnp.float32)

        def compute(params):
            vars_in = {"params": params}
            if state.batch_stats:
                vars_in["batch_stats"] = state.batch_stats
            out, mutated = model.apply(vars_in, images, train=True,
                                       rngs={"dropout": rng},
                                       mutable=["batch_stats"])
            u = jnp.tanh(beta * out["codes"])
            if keep:
                # bank rows for this batch are detached (reference :53-59)
                U2 = state.extra["U"].at[batch["index"]].set(
                    jax.lax.stop_gradient(u))
                Y2 = state.extra["Y"].at[batch["index"]].set(y)
            else:
                U2, Y2 = u, y
            sim = get_sim(y, Y2).astype(jnp.float32)
            dot = alpha * (u @ U2.T)
            exp_loss = log_trick(dot) - sim * dot
            s1 = jnp.maximum(sim.sum(), 1.0)
            s0 = jnp.maximum((1 - sim).sum(), 1.0)
            s = s1 + s0
            w = jnp.where(sim > 0, s / s1, s / s0)
            loss = (exp_loss * w).sum() / s
            new_extra = {"U": U2, "Y": Y2} if keep else state.extra
            return loss, (mutated.get("batch_stats", state.batch_stats),
                          new_extra, out)

        (loss, (new_bs, new_extra, out)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_state = state.replace(step=state.step + 1,
                                  params=optax.apply_updates(state.params,
                                                             updates),
                                  batch_stats=new_bs, opt_state=new_opt,
                                  extra=new_extra)
        metrics = {"loss": loss, "pairwise": loss, "beta": beta,
                   **accuracy_metrics(out, y)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def _hashnet_extra(state, config):
    crit = dict(config.get("criterion", {}) or {})
    if not int(crit.get("keep_train_size", 0)):
        return state
    n = int(config.get("_train_size_", 0) or crit.get("train_size", 0))
    assert n > 0, "keep_train_size needs the train-set size (set by the driver)"
    return state.replace(extra={
        "U": jnp.zeros((n, int(config["model"]["nbit"])), jnp.float32),
        "Y": jnp.zeros((n, int(config["model"]["nclass"])), jnp.float32)})


register_method(Method(
    "hashnet", functools.partial(_build_baseline, "pairwise"),
    _simple_loss(L.hashnet_loss),
    custom_step=_hashnet_step, init_extra=_hashnet_extra))
register_method(Method(
    "dpsh", functools.partial(_build_baseline, "pairwise"),
    _simple_loss(L.dpsh_loss)))
register_method(Method(
    "dtsh", functools.partial(_build_baseline, "pairwise"),
    _simple_loss(L.dtsh_loss)))
register_method(Method(
    "greedyhash", functools.partial(_build_baseline, "greedyhash"),
    _simple_loss(L.greedyhash_loss)))
register_method(Method(
    "unsup_greedyhash", functools.partial(_build_baseline, "unsup_greedyhash"),
    _simple_loss(L.unsup_greedyhash_loss), unsupervised=True))
register_method(Method(
    "ce", functools.partial(_build_baseline, "ce"),
    _simple_loss(L.ce_loss)))
register_method(Method(
    "descriptor", functools.partial(_build_baseline, "descriptor"),
    _null_loss))


def _build_finegrained(cls_name, config, codebook):
    from concepthash_tpu.models.finegrained import A2NetCE, FineGrainedConfig, SemiconCE

    m = config["model"]
    vcfg, acfg = _vision_and_adapters(config)
    fcfg = FineGrainedConfig(nbit=int(m["nbit"]), nclass=int(m["nclass"]),
                             num_attns=int(m.get("num_attns", m.get("nattns", 4))),
                             with_softplus=bool(m.get("with_softplus", False)),
                             temp=float(m.get("temp", 10.0)))
    from concepthash_tpu.models.finegrained import Semicon

    cls = {"a2net_ce": A2NetCE, "semicon_ce": SemiconCE,
           "semicon": Semicon}[cls_name]
    fixed = jnp.asarray(codebook) if codebook is not None else None
    return cls(vcfg, fcfg, adapters=acfg, fixed_center=fixed,
               backbone_cfg=config.get("backbone"),
               dtype=_compute_dtype(config))


register_method(Method(
    "a2net_ce", functools.partial(_build_finegrained, "a2net_ce"),
    _simple_loss(L.a2net_ce_loss)))
register_method(Method(
    "semicon_ce", functools.partial(_build_finegrained, "semicon_ce"),
    _simple_loss(L.semicon_ce_loss)))

# unsupervised family (reference trainers/{cibhash,bihalf,ssdh}.py — their
# loss/arch modules are absent upstream; implemented from the papers,
# losses/unsupervised.py)
from concepthash_tpu.losses import unsupervised as U  # noqa: E402

register_method(Method(
    "cibhash", functools.partial(_build_baseline, "pairwise"),
    _simple_loss(U.cibhash_loss), unsupervised=True, two_view=True))
register_method(Method(
    "bihalf", functools.partial(_build_baseline, "unsup_greedyhash"),
    _simple_loss(U.bihalf_loss), unsupervised=True, two_view=True))
register_method(Method(
    "nsh", functools.partial(_build_baseline, "nsh"),
    _simple_loss(U.nsh_loss), unsupervised=True, two_view=True))
register_method(Method(
    "ssdh", functools.partial(_build_baseline, "pairwise"),
    # eval batches carry no structure -> loss degenerates to 0 there
    lambda config, codebook: (lambda outputs, batch: U.ssdh_loss(
        outputs, batch["label"], S_batch=batch.get("aux"))),
    unsupervised=True, needs_structure=True))

# EMA-teacher pretraining (reference trainers/{moco,dino}.py — loss modules
# absent upstream; objectives per the papers, train/pretrain_steps.py)

def _build_pretrain(with_predictor, config, codebook):
    from concepthash_tpu.models.pretrain import PretrainConfig, ProjectorNet

    m = config["model"]
    vcfg, acfg = _vision_and_adapters(config)
    pcfg = PretrainConfig(proj_dim=int(m.get("proj_dim", m.get("nbit", 64))),
                          hidden_dim=int(m.get("hidden_dim", 256)),
                          with_predictor=with_predictor)
    return ProjectorNet(vcfg, pcfg, adapters=acfg,
                        backbone_cfg=config.get("backbone"),
                        dtype=_compute_dtype(config))


def _moco_step(model, config, tx, preprocess_fn, total_steps):
    from concepthash_tpu.train.pretrain_steps import make_moco_step

    crit = config.get("criterion", {}) or {}
    return make_moco_step(model, tx, preprocess_fn,
                          base_momentum=float(crit.get("momentum", 0.99)),
                          temperature=float(crit.get("temperature", 0.2)),
                          total_steps=total_steps)


def _dino_step(model, config, tx, preprocess_fn, total_steps):
    from concepthash_tpu.train.pretrain_steps import make_dino_step

    crit = config.get("criterion", {}) or {}
    return make_dino_step(model, tx, preprocess_fn,
                          momentum=float(crit.get("momentum", 0.996)),
                          center_momentum=float(crit.get("center_momentum", 0.9)),
                          tau_s=float(crit.get("tau_s", 0.1)),
                          tau_t=float(crit.get("tau_t", 0.04)))


def _teacher_extra(state, config):
    from concepthash_tpu.train.pretrain_steps import init_teacher_extra

    return init_teacher_extra(state)


def _dino_extra(state, config):
    from concepthash_tpu.train.pretrain_steps import init_dino_extra

    m = config["model"]
    return init_dino_extra(state, int(m.get("proj_dim", m.get("nbit", 64))))


register_method(Method(
    "moco", functools.partial(_build_pretrain, True), _null_loss,
    unsupervised=True, custom_step=_moco_step, init_extra=_teacher_extra))
register_method(Method(
    "dino", functools.partial(_build_pretrain, False), _null_loss,
    unsupervised=True, custom_step=_dino_step, init_extra=_dino_extra))


def _build_mae(config, codebook):
    from concepthash_tpu.models.mae import MAE, MAEConfig

    m = config["model"]
    b = config.get("backbone", {}) or {}
    mcfg = MAEConfig(
        image_size=int(b.get("image_size", config.get("dataset", {})
                             .get("crop", 224))),
        patch_size=int(b.get("patch_size", 16)),
        enc_dim=int(b.get("hidden_size", 768)),
        enc_layers=int(b.get("num_layers", 12)),
        enc_heads=int(b.get("num_heads", 12)),
        dec_dim=int(m.get("dec_dim", 256)),
        dec_layers=int(m.get("dec_layers", 4)),
        dec_heads=int(m.get("dec_heads", 8)),
        mask_ratio=float(m.get("mask_ratio", 0.75)),
    )
    return MAE(mcfg, dtype=_compute_dtype(config))


def _mae_loss(config, codebook):
    from concepthash_tpu.models.mae import mae_loss

    return lambda outputs, batch: mae_loss(outputs, batch["label"])


register_method(Method("mae", _build_mae, _mae_loss, unsupervised=True))


def _autoencoder_loss(config, codebook):
    """Plain reconstruction over ALL patches (reference trainers/
    autoencoder.py over base_generation — arch absent upstream; expressed as
    the mask_ratio=0 case of the MAE net)."""

    def loss(outputs, batch):
        if "recon" not in outputs:
            return jnp.float32(0.0), {}
        err = ((outputs["recon"] - outputs["target"]) ** 2).mean()
        return err, {"recon_mse": err}

    return loss


register_method(Method("autoencoder", _build_mae, _autoencoder_loss,
                       unsupervised=True))

# contrastive CLIP finetune against class-text centers (reference
# trainers/clip.py; text embeddings come from the codebook 'L' stage)
register_method(Method(
    "clip", functools.partial(_build_baseline, "clip"),
    _simple_loss(L.ce_loss), codebook="continuous"))

# TBH — adversarial twin-bottleneck hashing (models/tbh.py); critic params
# and optimizer ride in TrainState.extra
def _build_tbh(config, codebook):
    from concepthash_tpu.models.tbh import TBHConfig, TBHNet

    m = config["model"]
    vcfg, acfg = _vision_and_adapters(config)
    tcfg = TBHConfig(nbit=int(m["nbit"]), zdim=int(m.get("zdim", m["nbit"])),
                     hidden=int(m.get("hidden_dim", 256)))
    return TBHNet(vcfg, tcfg, adapters=acfg,
                  backbone_cfg=config.get("backbone"),
                  dtype=_compute_dtype(config))


def _tbh_disc_and_tx(config):
    import optax

    from concepthash_tpu.models.tbh import Discriminator

    crit = config.get("criterion", {}) or {}
    return Discriminator(), optax.adam(float(crit.get("disc_lr", 1e-4)))


def _tbh_step(model, config, tx, preprocess_fn, total_steps):
    from concepthash_tpu.train.pretrain_steps import make_tbh_step

    crit = config.get("criterion", {}) or {}
    disc, disc_tx = _tbh_disc_and_tx(config)
    return make_tbh_step(model, tx, disc, disc_tx, preprocess_fn,
                         adv_weight=float(crit.get("adv_weight", 1.0)))


def _tbh_extra(state, config):
    from concepthash_tpu.train.pretrain_steps import init_tbh_extra

    disc, disc_tx = _tbh_disc_and_tx(config)
    m = config["model"]
    zdim = int(m.get("zdim", m["nbit"]))
    return init_tbh_extra(state, disc, disc_tx, zdim,
                          jax.random.PRNGKey(int(config.get("seed", 42)) + 9))


register_method(Method("tbh", _build_tbh, _null_loss, unsupervised=True,
                       custom_step=_tbh_step, init_extra=_tbh_extra))


# ODC — online deep clustering (reference trainers/odc.py:10-49,105-171):
# a per-sample feature memory EMA-updated every step (Memory.update,
# momentum 0.5), per-batch pseudo-label reassignment to the nearest
# centroid, and a full centroid recomputation every update_interval steps —
# all on-device inside the jitted step (the reference round-trips codes to
# CPU each batch). Initial clustering: sklearn k-means over extracted
# features (reference uses faiss.Kmeans niter=50 — faiss absent here).
# Cluster-size loss reweighting follows the ODC paper (Zhan et al., CVPR
# 2020, w_c ∝ N_c^-0.5) since the upstream loss module is a missing sdc
# import (criterion.set_reweight, trainers/odc.py:119,164).
def _odc_step(model, config, tx, preprocess_fn, total_steps):
    import optax

    from concepthash_tpu.train.state import accuracy_metrics

    crit = dict(config.get("criterion", {}) or {})
    momentum = float(crit.get("memory_momentum", 0.5))
    interval = int(crit.get("update_interval",
                            crit.get("cluster_interval", 10)))
    nclass = int(config["model"]["nclass"])

    def step_fn(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        images = batch["image"]
        if preprocess_fn is not None:
            images = preprocess_fn(images, jax.random.fold_in(rng, 7))
        idx = batch["index"]
        pseudo = state.extra["labels"][idx]
        y = jax.nn.one_hot(pseudo, nclass, dtype=jnp.float32)
        w = state.extra["weights"][pseudo]

        def compute(params):
            vars_in = {"params": params}
            if state.batch_stats:
                vars_in["batch_stats"] = state.batch_stats
            out, mutated = model.apply(vars_in, images, train=True,
                                       rngs={"dropout": rng},
                                       mutable=["batch_stats"])
            ce = optax.softmax_cross_entropy(
                out["logits"].astype(jnp.float32), y)
            # torch weighted CE: sum(w_i * ce_i) / sum(w_i) over the batch
            loss = (ce * w).sum() / jnp.maximum(w.sum(), 1e-12)
            return loss, (mutated.get("batch_stats", state.batch_stats), out)

        (loss, (new_bs, out)), grads = jax.value_and_grad(
            compute, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)

        # memory EMA toward the L2-normalized new codes (Memory.update :24-34)
        feats = jax.lax.stop_gradient(out["codes"]).astype(jnp.float32)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        cur = state.extra["features"][idx]
        new_rows = cur - momentum * (cur - feats)
        mem = state.extra["features"].at[idx].set(new_rows)
        # reassign this batch's labels against the CURRENT centroids
        cents = state.extra["centroids"]
        d = ((new_rows[:, None] - cents[None]) ** 2).sum(-1)
        labels = state.extra["labels"].at[idx].set(
            jnp.argmin(d, axis=1).astype(jnp.int32))

        def refresh(_):
            onehot = jax.nn.one_hot(labels, nclass, dtype=jnp.float32)
            counts = onehot.sum(axis=0)
            sums = onehot.T @ mem
            new_c = sums / jnp.maximum(counts[:, None], 1.0)
            # empty clusters keep their old centroid (the reference's
            # mean-of-empty is NaN — latent upstream bug, odc.py:40-43)
            new_c = jnp.where(counts[:, None] > 0, new_c, cents)
            # w_c ∝ N_c^-0.5 normalized to SUM 1 over classes — upstream
            # set_reweight semantics (trainers/odc.py:119); the per-batch
            # torch weighted-CE divide-by-selected-weight-sum happens in
            # `compute` above.
            rw = jnp.where(counts > 0, 1.0 / jnp.sqrt(jnp.maximum(counts, 1.0)),
                           0.0)
            rw = rw / jnp.maximum(rw.sum(), 1e-12)
            return new_c, rw

        # reference fires at global_step % update_interval == 0 — i.e. on the
        # very first batch after k-means init (trainers/odc.py:162)
        centroids, weights = jax.lax.cond(
            state.step % interval == 0, refresh,
            lambda _: (cents, state.extra["weights"]), None)

        new_state = state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs, opt_state=new_opt,
            extra={"features": mem, "labels": labels,
                   "centroids": centroids, "weights": weights})
        metrics = {"loss": loss, "ce": loss, **accuracy_metrics(out, y)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


register_method(Method(
    "odc", functools.partial(_build_baseline, "ce"),
    _simple_loss(L.ce_loss), unsupervised=True, regime="odc",
    custom_step=_odc_step))

# shallow methods: model = descriptor trunk; fit happens in the driver
for _name in ("itq", "pca", "lsh", "sh"):
    register_method(Method(
        _name, functools.partial(_build_baseline, "descriptor"),
        _null_loss, regime="shallow"))

# asymmetric methods (ADSH alternating optimization; SEMICON = the SEM
# suppression-attention global+local head — reference SEMICONWithAdapter,
# models/arch/semicon.py:548-641 — trained under the same adsh regime,
# trainers/semicon.py:31-175)
register_method(Method(
    "adsh", functools.partial(_build_baseline, "csq"),  # tanh codes head
    lambda config, codebook: None,  # loss handled by the adsh regime
    regime="adsh"))
register_method(Method(
    "semicon", functools.partial(_build_finegrained, "semicon"),
    lambda config, codebook: None, regime="adsh"))


# ---------------------------------------------------------------------------
# codebook stage
# ---------------------------------------------------------------------------

def prepare_codebook(method: Method, config, logdir: str | None = None,
                     text_embedder=None) -> Optional[np.ndarray]:
    """Run (or load) the codebook stage if the method needs one. Reads the
    model config's ``fixed_center`` / criterion's ``codebook`` spec, which
    keep the reference YAML shape (configs/model/*.yaml)."""
    if method.codebook is None:
        return None
    m = config["model"]
    spec = dict(m.get("fixed_center")
                or (config.get("criterion", {}) or {}).get("codebook")
                or m.get("codebook") or {})
    spec.pop("_target_", None)
    spec.setdefault("codebook_method", "N")
    spec.setdefault("nclass", int(m["nclass"]))
    spec.setdefault("nbit", int(m["nbit"]))
    spec.setdefault("seed", int(config.get("seed", 42)))
    if method.codebook == "continuous":
        spec.setdefault("quantized", False)
    if text_embedder is not None:
        spec["text_embedder"] = text_embedder

    from concepthash_tpu.train import codebook as CB

    if logdir and "text_embedder" not in spec:
        import os

        return CB.load_or_create_codebook(
            os.path.join(logdir, "outputs", "codebook.msgpack"), **spec)
    return CB.get_codebook(**spec)

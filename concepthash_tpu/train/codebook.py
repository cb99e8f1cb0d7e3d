"""Codebook generation — an explicit, cached pipeline stage.

The reference generates codebooks *inside* hydra model instantiation
(side-effectful config, reference trainers/orthohash.py:63-305 invoked from
configs/model/*.yaml; SURVEY.md §3.4/§5.6 flags this as a design smell). Here
it is a pure function of (method, nclass, nbit, seed[, class names]) executed
before model construction and cached to ``<logdir>/outputs/codebook.msgpack``.

Methods (reference get_codebook, trainers/orthohash.py:63-78):
  N  gaussian;  B  Bernoulli ±1;  H  Hadamard (CSQ recipe);  O  max-min-Hamming
  random search;  L  CLIP text embeddings of class-name prompts, optionally
  binarized (itq / pca / pcaw / rand);  quantized=False returns the raw
  embeddings (ConceptHash's continuous centers).

sklearn/scipy are replaced by explicit jax/numpy SVD with sign-convention
fixing for determinism (SURVEY.md §7 hard-part 7).
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# deterministic linear algebra helpers
# ---------------------------------------------------------------------------

def pca_fit(x: np.ndarray, k: int, whiten: bool = False):
    """Deterministic PCA via SVD with sign fixing (largest-|loading| positive).
    Returns (mean, components (k, D), scale (k,))."""
    x = np.asarray(x, np.float64)
    if k > min(x.shape):
        raise ValueError(f"PCA to {k} dims needs >= {k} samples and features; "
                         f"got {x.shape} (same constraint as sklearn PCA)")
    mean = x.mean(axis=0)
    xc = x - mean
    _, s, vt = np.linalg.svd(xc, full_matrices=False)
    comps = vt[:k]
    # sign convention: flip so the max-abs element of each component is >0
    signs = np.sign(comps[np.arange(comps.shape[0]),
                          np.abs(comps).argmax(axis=1)])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    if whiten:
        scale = np.sqrt(x.shape[0] - 1) / np.maximum(s[:k], 1e-12)
    else:
        scale = np.ones(k)
    return mean, comps.astype(np.float32), scale.astype(np.float32)


def pca_transform(x, mean, comps, scale):
    return ((np.asarray(x) - mean) @ comps.T) * scale


def itq_fit(v: np.ndarray, nbit: int, iters: int = 100, seed: int = 42):
    """ITQ: PCA to nbit dims then alternating-minimization rotation
    (reference models/loss/itq.py:37-58). Returns (mean, comps, scale, R)."""
    mean, comps, scale = pca_fit(v, nbit)
    z = pca_transform(v, mean, comps, scale)
    rng = np.random.default_rng(seed)
    r = np.linalg.qr(rng.standard_normal((nbit, nbit)))[0]
    for _ in range(iters):
        b = np.sign(z @ r)
        u, _, vt = np.linalg.svd(b.T @ z)
        r = (u @ vt).T
    return mean, comps, scale, r.astype(np.float32)


def hadamard_matrix(n: int) -> np.ndarray:
    """Sylvester Hadamard (n must be a power of 2)."""
    assert n > 0 and (n & (n - 1)) == 0, "nbit must be a power of 2 for 'H'"
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def hadamard_codebook(nclass: int, nbit: int, seed: int = 42) -> np.ndarray:
    """CSQ's Hadamard centers (reference get_hadamard, trainers/orthohash.py:24-60):
    rows of [H; -H], Bernoulli fill if nclass > 2*nbit."""
    h = hadamard_matrix(nbit)
    h2 = np.concatenate([h, -h], axis=0)
    if nclass <= h2.shape[0]:
        return h2[:nclass].astype(np.float32)
    rng = np.random.default_rng(seed)
    extra = np.ones((nclass - h2.shape[0], nbit), np.float32)
    for row in extra:
        flip = rng.choice(nbit, nbit // 2, replace=False)
        row[flip] = -1
    return np.concatenate([h2, extra]).astype(np.float32)


def maxmin_hamming_codebook(nclass: int, nbit: int, seed: int = 42,
                            maxtries: int = 10000, initdist: float = 0.61,
                            mindist: float = 0.2, reducedist: float = 0.05):
    """'O' method: rejection-sample ±1 rows with pairwise normalized-Hamming
    distance above a shrinking threshold (reference optimize_codebook,
    trainers/orthohash.py:267-305)."""
    rng = np.random.default_rng(seed)
    rows = []
    curr = initdist
    fails = 0
    while len(rows) < nclass:
        c = np.sign(rng.standard_normal(nbit)).astype(np.float32)
        c[c == 0] = 1
        ok = all(0.5 * (nbit - c @ r) / nbit >= curr for r in rows)
        if ok:
            rows.append(c)
            fails = 0
        else:
            fails += 1
            if fails >= maxtries:
                fails = 0
                curr -= reducedist
                if curr < mindist:
                    raise ValueError("cannot find a codebook at this bit width")
    out = np.stack(rows)
    return out[rng.permutation(nclass)]


# ---------------------------------------------------------------------------
# language-guided codebook
# ---------------------------------------------------------------------------

def embed_class_names(class_names: list, model_id: str = "openai/clip-vit-base-patch32",
                      prompt_prefix: str = "a photo of a ",
                      prompt_postfix: str = "", batch_size: int = 100,
                      text_tower=None, text_params=None, tokenizer=None) -> np.ndarray:
    """CLIP-text pooled embeddings of "<prefix><class name><postfix>" prompts
    (reference language_guided_codebook, trainers/orthohash.py:94-137).

    Uses the flax ClipTextTower; weights/tokenizer come from HF (network or
    cache) unless provided. Returns (nclass, width) float32 — the *pre-
    projection* pooled output, matching the reference's
    ``text_model(...).pooler_output``.
    """
    if prompt_prefix and not prompt_prefix.endswith(" "):
        prompt_prefix += " "
    prompts = [f"{prompt_prefix}{name}{prompt_postfix}" for name in class_names]
    logging.info("codebook prompts: e.g. %r", prompts[0])

    if text_tower is None or text_params is None:
        from transformers import CLIPModel

        from concepthash_tpu.models.clip import ClipTextTower
        from concepthash_tpu.models.clip_loader import (
            text_config_from_hf,
            text_params_from_torch,
        )

        from concepthash_tpu.utils.hf_offline import ensure_hf_reachable

        ensure_hf_reachable(model_id)  # fast-fail -> offline fallback
        hf = CLIPModel.from_pretrained(model_id)
        tcfg = text_config_from_hf(hf.config.text_config)
        text_tower = ClipTextTower(tcfg)
        init = text_tower.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8), jnp.int32))["params"]
        from concepthash_tpu.models.clip_loader import merge_ported

        text_params = merge_ported(init, text_params_from_torch(
            hf.state_dict(), tcfg.num_layers))
    if tokenizer is None:
        from transformers import CLIPTokenizerFast

        from concepthash_tpu.utils.hf_offline import ensure_hf_reachable

        ensure_hf_reachable(model_id, "tokenizer.json")
        tokenizer = CLIPTokenizerFast.from_pretrained(model_id)

    ids = tokenizer(prompts, padding=True, truncation=True, max_length=77,
                    return_tensors="np")["input_ids"].astype(np.int32)
    apply = jax.jit(lambda p, i: text_tower.apply({"params": p}, i)["pooled"])
    outs = []
    for s in range(0, len(ids), batch_size):
        outs.append(np.asarray(apply(text_params, jnp.asarray(ids[s:s + batch_size]))))
    return np.concatenate(outs).astype(np.float32)


def ae_fit(embedding: np.ndarray, nbit: int, method: str = "ae",
           iters: int = 10000, t: float = 1.0, identity_scale: float = 1.0,
           seed: int = 42, lr: float = 1e-4,
           n_induced: int = 1000) -> np.ndarray:
    """Autoencoder binarizer (reference trainers/orthohash.py:164-252):
    train encoder/decoder on the class embeddings with
      MSE reconstruction
      + exp(-rec/t) * (1 - cos(b, sign(b)))          (quantization)
      + identity_scale * ||G_target - G_binary||^2    (similarity preservation)
    where G_target is I (``ae``), the embedding cosine gram (``ae_cossim``),
    its min-max-rescaled version (``ae_norm_cossim``), or the induced-query
    gram (``induced_*`` prefix, InducedEncoder :81-91); a ``non`` prefix makes
    encoder/decoder 2-layer GELU MLPs (:166-177). Full-batch Adam(1e-4),
    jitted lax.scan over iterations. Returns real-valued targets; caller
    signs them.
    """
    variant = method
    induced = "induced_" in variant
    variant = variant.replace("induced_", "")
    nonlinear = variant.startswith("non")
    variant = variant.replace("non", "")  # nonae -> ae

    x = jnp.asarray(embedding, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 8)

    def dense_init(k, din, dout):
        lim = 1.0 / np.sqrt(din)
        return {"w": jax.random.uniform(k, (din, dout), jnp.float32, -lim, lim),
                "b": jnp.zeros((dout,), jnp.float32)}

    if nonlinear:
        params = {"e1": dense_init(ks[0], d, d), "e2": dense_init(ks[1], d, nbit),
                  "d1": dense_init(ks[2], nbit, d), "d2": dense_init(ks[3], d, d)}

        def enc(p, z):
            return jax.nn.gelu(z @ p["e1"]["w"] + p["e1"]["b"]) @ p["e2"]["w"] + p["e2"]["b"]

        def dec(p, b):
            return jax.nn.gelu(b @ p["d1"]["w"] + p["d1"]["b"]) @ p["d2"]["w"] + p["d2"]["b"]
    else:
        params = {"e": dense_init(ks[0], d, nbit), "d": dense_init(ks[2], nbit, d)}

        def enc(p, z):
            return z @ p["e"]["w"] + p["e"]["b"]

        def dec(p, b):
            return b @ p["d"]["w"] + p["d"]["b"]

    if induced:
        params["queries"] = jax.random.normal(ks[4], (n_induced, d), jnp.float32)

    from concepthash_tpu.ops.numerics import l2_normalize as l2n

    if not induced:
        if variant == "ae_cossim":
            gram_target = l2n(x) @ l2n(x).T
        elif variant == "ae_norm_cossim":
            g = l2n(x) @ l2n(x).T
            gram_target = (g - g.min()) / (g.max() - g.min()) * 2.0 - 1.0
        else:  # plain ae: orthogonality target
            gram_target = jnp.eye(n, dtype=jnp.float32)
    else:
        gram_target = None  # recomputed from the induced queries each step

    import optax

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        b = enc(p, x)
        rec = dec(p, b)
        rec_loss = jnp.mean((x - rec) ** 2, axis=-1)          # (n,)
        bl2 = l2n(b)
        if induced:
            attn_t = l2n(l2n(p["queries"]) @ l2n(x).T)
            g_t = attn_t @ attn_t.T
            if variant == "ae_norm_cossim":
                g_t = (g_t - g_t.min()) / (g_t.max() - g_t.min()) * 2.0 - 1.0
            qb = enc(p, p["queries"])
            attn_b = l2n(l2n(qb) @ bl2.T)
            g_b = attn_b @ attn_b.T
        else:
            g_t = gram_target
            g_b = bl2 @ bl2.T
        identity_loss = jnp.mean((g_t - g_b) ** 2)
        quan = 1.0 - jnp.sum(bl2 * l2n(jax.lax.stop_gradient(jnp.sign(b))),
                             axis=-1)
        total = (rec_loss.mean()
                 + jnp.mean(jnp.exp(-rec_loss / t) * quan)
                 + identity_scale * identity_loss)
        return total

    @jax.jit
    def step(carry, _):
        p, s = carry
        g = jax.grad(loss_fn)(p)
        updates, s = tx.update(g, s, p)
        return (optax.apply_updates(p, updates), s), None

    (params, _), _ = jax.lax.scan(step, (params, opt_state), None,
                                  length=int(iters))
    return np.asarray(enc(params, x), np.float32)


def binarize_embedding(embedding: np.ndarray, nbit: int, method: str = "pca",
                       seed: int = 42, **ae_kwargs) -> np.ndarray:
    """Continuous (nclass, D) -> real-valued (nclass, nbit) targets; caller
    signs them (reference trainers/orthohash.py:145-162)."""
    if method == "itq":
        mean, comps, scale, r = itq_fit(embedding, nbit, seed=seed)
        return (pca_transform(embedding, mean, comps, scale) @ r).astype(np.float32)
    if method == "pca":
        mean, comps, scale = pca_fit(embedding, nbit)
        return pca_transform(embedding, mean, comps, scale).astype(np.float32)
    if method == "pcaw":
        mean, comps, scale = pca_fit(embedding, nbit, whiten=True)
        return pca_transform(embedding, mean, comps, scale).astype(np.float32)
    if method == "rand":
        rng = np.random.default_rng(seed)
        idx = rng.permutation(embedding.shape[1])[:nbit]
        return embedding[:, idx].astype(np.float32)
    if "ae" in method:  # ae / nonae / [induced_]ae[_cossim|_norm_cossim]
        return ae_fit(embedding, nbit, method=method, seed=seed, **ae_kwargs)
    raise ValueError(f"unknown binary_method {method!r} "
                     "(supported: itq, pca, pcaw, rand, ae*)")


def get_codebook(codebook_method: str, nclass: int, nbit: int, seed: int = 42,
                 class_name_path: str | None = None, class_names: list | None = None,
                 model_id: str = "openai/clip-vit-base-patch32",
                 binary_method: str = "pca", quantized: bool = True,
                 prompt_prefix: str = "a photo of a ", prompt_postfix: str = "",
                 text_embedder=None, path: str | None = None,
                 ae_iters: int = 10000, t: float = 1.0,
                 identity_scale: float = 1.0, **_ignored) -> np.ndarray:
    """Reference-parity codebook factory (trainers/orthohash.py:63-78).

    'L' + quantized=False returns raw text embeddings (ConceptHash centers);
    every other path returns a signed (nclass, nbit) ±1 matrix.
    ``text_embedder`` overrides the CLIP text stage (offline testing).
    'file' loads a user-provided (nclass, D) matrix from ``path`` (.npy or
    msgpack checkpoint with a 'codebook' key) — signed unless quantized=False.
    """
    rng = np.random.default_rng(seed)
    if codebook_method == "file":
        if path.endswith(".npy"):
            cb = np.load(path).astype(np.float32)
        else:
            from concepthash_tpu.utils import io

            cb = np.asarray(io.load_checkpoint(path)["codebook"], np.float32)
        assert cb.shape[0] == nclass, (cb.shape, nclass)
        if not quantized:
            return cb
    elif codebook_method == "N":
        cb = rng.standard_normal((nclass, nbit)).astype(np.float32)
    elif codebook_method == "B":
        cb = (rng.random((nclass, nbit)) < 0.5).astype(np.float32) * 2 - 1
    elif codebook_method == "H":
        cb = hadamard_codebook(nclass, nbit, seed)
    elif codebook_method == "O":
        cb = maxmin_hamming_codebook(nclass, nbit, seed)
    elif codebook_method == "L":
        if class_names is None:
            from concepthash_tpu.data.manifest import read_class_names
            import os

            class_names = read_class_names(os.path.dirname(class_name_path),
                                           os.path.basename(class_name_path))
        if text_embedder is not None:
            embedding = np.asarray(text_embedder(class_names), np.float32)
        else:
            embedding = embed_class_names(class_names, model_id,
                                          prompt_prefix, prompt_postfix)
        if not quantized:
            return embedding
        ae_kw = ({"iters": int(ae_iters), "t": float(t),
                  "identity_scale": float(identity_scale)}
                 if "ae" in binary_method else {})
        cb = binarize_embedding(embedding, nbit, binary_method, seed, **ae_kw)
    else:
        raise ValueError(f"unknown codebook_method {codebook_method!r}")

    signed = np.sign(cb).astype(np.float32)
    signed[signed == 0] = 1.0
    return signed


def load_or_create_codebook(cache_path: str, **kwargs) -> np.ndarray:
    """Cache wrapper (replaces outputs/codebook.pth, reference
    trainers/orthohash.py:345-347)."""
    import os

    from concepthash_tpu.utils import io

    if os.path.exists(cache_path):
        blob = io.load_checkpoint(cache_path)
        return np.asarray(blob["codebook"])
    cb = get_codebook(**kwargs)
    io.save_checkpoint({"codebook": cb}, cache_path)
    return cb


def embed_class_name_tokens(class_names: list,
                            model_id: str = "openai/clip-vit-base-patch32",
                            prompt_prefix: str = "a photo of a ",
                            prompt_postfix: str = "",
                            batch_size: int = 100) -> np.ndarray:
    """Token-level text embeddings for the FILIP variant (reference
    LGHWithFixedPromptFILIP, models/arch/coop.py:636-649): text tower
    last_hidden_state projected by text_projection -> (nclass, T, proj)."""
    from transformers import CLIPModel, CLIPTokenizerFast

    from concepthash_tpu.models.clip import ClipTextTower
    from concepthash_tpu.models.clip_loader import (
        merge_ported,
        text_config_from_hf,
        text_params_from_torch,
    )

    if prompt_prefix and not prompt_prefix.endswith(" "):
        prompt_prefix += " "
    prompts = [f"{prompt_prefix}{n}{prompt_postfix}" for n in class_names]
    from concepthash_tpu.utils.hf_offline import ensure_hf_reachable

    ensure_hf_reachable(model_id)  # fast-fail -> FILIP pseudo-token fallback
    hf = CLIPModel.from_pretrained(model_id)
    tcfg = text_config_from_hf(hf.config.text_config)
    tower = ClipTextTower(tcfg)
    init = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    params = merge_ported(init, text_params_from_torch(hf.state_dict(),
                                                       tcfg.num_layers))
    tok = CLIPTokenizerFast.from_pretrained(model_id)
    ids = tok(prompts, padding=True, truncation=True, max_length=77,
              return_tensors="np")["input_ids"].astype(np.int32)
    proj = params["text_projection"]["kernel"]

    def apply(batch_ids):
        out = tower.apply({"params": params}, jnp.asarray(batch_ids))
        return np.asarray(out["last_hidden_state"] @ proj)

    outs = [apply(ids[s:s + batch_size]) for s in range(0, len(ids), batch_size)]
    return np.concatenate(outs).astype(np.float32)

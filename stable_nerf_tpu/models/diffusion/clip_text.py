"""CLIP text transformers (SDXL's dual text encoders) in functional JAX.

The reference encodes exactly one prompt — the empty string — once at init to
cache SDXL conditioning embeds (reference stable_diffusion/network.py:114-168
→ utils/sd_utils.py:133-340).  This module provides the full text-encoder
stack so that path (and arbitrary prompts, given token ids) works natively:

  * CLIP-L/14 (`text_encoder`: 12 layers, d=768, quick_gelu) and
    OpenCLIP bigG (`text_encoder_2`: 32 layers, d=1280, gelu,
    text_projection) configurations;
  * ``encode_prompt_sdxl`` reproducing sd_utils.encode_prompt: concat of the
    two encoders' PENULTIMATE hidden states → [B, 77, 2048] prompt embeds,
    plus text_encoder_2's projected pooled output → [B, 1280];
  * HF-weight conversion (`params_from_hf_state_dict`) verified bit-close
    against torch `transformers.CLIPTextModel` in tests;
  * hardcoded empty-prompt token ids (the tokenizers' files may be absent in
    a zero-egress environment; "" tokenizes to [bos, eos, pad…] which is
    static).

Attention is jnp einsum + softmax — XLA fuses this fine at 77 tokens; no
custom kernel warranted.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    hidden_act: str = "quick_gelu"
    projection_dim: int = 0            # >0 → text_projection head (encoder 2)
    bos_token_id: int = 49406
    eos_token_id: int = 49407
    pad_token_id: int = 49407          # CLIP-L pads with eos; bigG pads with 0


def clip_l_config() -> CLIPTextConfig:
    """openai/clip-vit-large-patch14 text tower (SDXL text_encoder)."""
    return CLIPTextConfig()


def open_clip_bigg_config() -> CLIPTextConfig:
    """laion OpenCLIP bigG text tower (SDXL text_encoder_2)."""
    return CLIPTextConfig(
        hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
        hidden_act="gelu", projection_dim=1280, pad_token_id=0,
    )


def empty_prompt_ids(cfg: CLIPTextConfig, batch: int = 1) -> jnp.ndarray:
    """Token ids for "": [bos, eos, pad × 75]."""
    ids = np.full((batch, cfg.max_positions), cfg.pad_token_id, np.int32)
    ids[:, 0] = cfg.bos_token_id
    ids[:, 1] = cfg.eos_token_id
    return jnp.asarray(ids)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def clip_text_init(key, cfg: CLIPTextConfig, dtype=jnp.float32) -> Dict:
    """Random init with HF-compatible tree structure (for tests; real use
    loads converted pretrained weights)."""
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    keys = iter(jax.random.split(key, 4 + 12 * L))

    def lin(kin, din, dout):
        return {
            "kernel": jax.random.normal(kin, (din, dout), dtype) * 0.02,
            "bias": jnp.zeros((dout,), dtype),
        }

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(L):
        layers.append({
            "ln1": ln(),
            "q": lin(next(keys), d, d),
            "k": lin(next(keys), d, d),
            "v": lin(next(keys), d, d),
            "out": lin(next(keys), d, d),
            "ln2": ln(),
            "fc1": lin(next(keys), d, ff),
            "fc2": lin(next(keys), ff, d),
        })
    params = {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(next(keys), (cfg.max_positions, d), dtype) * 0.02,
        "layers": layers,
        "final_ln": ln(),
    }
    if cfg.projection_dim:
        params["text_projection"] = (
            jax.random.normal(next(keys), (d, cfg.projection_dim), dtype) * 0.02
        )
    return params


def params_from_hf_state_dict(state_dict, cfg: CLIPTextConfig,
                              strict: bool = False) -> Dict:
    """Convert a torch CLIPTextModel(WithProjection) state_dict to our tree.

    Linear weights are transposed ([out, in] → [in, out]).  ``strict``
    asserts every checkpoint key was consumed (``position_ids`` buffers,
    emitted by older transformers versions, are ignored).
    """
    used = set()

    def t(name):
        used.add(name)
        w = state_dict[name]
        arr = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        return jnp.asarray(arr, jnp.float32)

    def lin(prefix):
        return {"kernel": t(prefix + ".weight").T, "bias": t(prefix + ".bias")}

    def ln(prefix):
        return {"scale": t(prefix + ".weight"), "bias": t(prefix + ".bias")}

    p = "text_model."
    layers = []
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append({
            "ln1": ln(lp + "layer_norm1"),
            "q": lin(lp + "self_attn.q_proj"),
            "k": lin(lp + "self_attn.k_proj"),
            "v": lin(lp + "self_attn.v_proj"),
            "out": lin(lp + "self_attn.out_proj"),
            "ln2": ln(lp + "layer_norm2"),
            "fc1": lin(lp + "mlp.fc1"),
            "fc2": lin(lp + "mlp.fc2"),
        })
    params = {
        "token_embedding": t(p + "embeddings.token_embedding.weight"),
        "position_embedding": t(p + "embeddings.position_embedding.weight"),
        "layers": layers,
        "final_ln": ln(p + "final_layer_norm"),
    }
    if cfg.projection_dim and "text_projection.weight" in state_dict:
        params["text_projection"] = t("text_projection.weight").T
    if strict:
        unused = {k for k in state_dict if k not in used
                  and not k.endswith("position_ids")
                  and k != "logit_scale"}
        if unused:
            raise ValueError(
                f"CLIP text: {len(unused)} checkpoint key(s) not consumed — "
                f"config/naming mismatch? e.g. {sorted(unused)[:10]}")
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _act(name, x):
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _attn(layer, x, cfg: CLIPTextConfig, causal_bias):
    B, S, d = x.shape
    h = cfg.num_heads
    hd = d // h

    def proj(p, v):
        return (v @ p["kernel"] + p["bias"]).reshape(B, S, h, hd).transpose(0, 2, 1, 3)

    q = proj(layer["q"], x) * (hd ** -0.5)
    k = proj(layer["k"], x)
    v = proj(layer["v"], x)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + causal_bias
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, d)
    return o @ layer["out"]["kernel"] + layer["out"]["bias"]


def clip_text_apply(
    params: Dict, input_ids, cfg: CLIPTextConfig
) -> Dict[str, jnp.ndarray]:
    """Run the text transformer.

    Returns:
      last_hidden_state: [B, 77, d] (after final LN)
      penultimate: [B, 77, d] hidden states entering the last layer's output
        — i.e. hidden_states[-2] in HF terms (pre-final-LN), the tensor SDXL
        conditioning uses (sd_utils.py encode_prompt, clip_skip=None branch).
      pooled: [B, d] last_hidden at the argmax token (eos), then
        text_projection when configured → [B, projection_dim].
    """
    B, S = input_ids.shape
    x = params["token_embedding"][input_ids] + params["position_embedding"][:S]

    causal = jnp.triu(jnp.full((S, S), -jnp.inf), k=1)[None, None]
    hidden_states = [x]
    for layer in params["layers"]:
        y = _attn(layer, _layer_norm(layer["ln1"], x), cfg, causal)
        x = x + y
        y = _layer_norm(layer["ln2"], x)
        y = _act(cfg.hidden_act, y @ layer["fc1"]["kernel"] + layer["fc1"]["bias"])
        y = y @ layer["fc2"]["kernel"] + layer["fc2"]["bias"]
        x = x + y
        hidden_states.append(x)

    last = _layer_norm(params["final_ln"], x)
    # pooled at the FIRST eos token (HF CLIP semantics for eos_token_id != 2;
    # coincides with legacy argmax pooling for real CLIP tokenizations)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = last[jnp.arange(B), eos_pos]
    if "text_projection" in params:
        pooled = pooled @ params["text_projection"]
    return {
        "last_hidden_state": last,
        "penultimate": hidden_states[-2],
        "pooled": pooled,
    }


def encode_prompt_sdxl(
    params_1: Dict, params_2: Dict, ids_1, ids_2,
    cfg_1: CLIPTextConfig = None, cfg_2: CLIPTextConfig = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SDXL dual-encoder prompt embedding (reference utils/sd_utils.py:133-340
    essential path: both penultimate hidden states concatenated on the feature
    axis; pooled comes from encoder 2's projection).

    Returns (prompt_embeds [B, 77, 2048], pooled_embeds [B, 1280]).
    """
    cfg_1 = cfg_1 or clip_l_config()
    cfg_2 = cfg_2 or open_clip_bigg_config()
    out_1 = clip_text_apply(params_1, ids_1, cfg_1)
    out_2 = clip_text_apply(params_2, ids_2, cfg_2)
    prompt_embeds = jnp.concatenate(
        [out_1["penultimate"], out_2["penultimate"]], axis=-1
    )
    return prompt_embeds, out_2["pooled"]


def encode_prompt(
    params_1: Dict, params_2: Dict, ids_1, ids_2, neg_ids_1, neg_ids_2,
    cfg_1: CLIPTextConfig = None, cfg_2: CLIPTextConfig = None,
):
    """Full reference-signature prompt encoding (utils/sd_utils.py:133-340):
    positive AND negative (CFG) embeds.

    Returns (prompt_embeds, negative_prompt_embeds, pooled,
    negative_pooled) — the 4-tuple init_empty_prompts consumes
    (reference stable_diffusion/network.py:118-134)."""
    pe, pp = encode_prompt_sdxl(params_1, params_2, ids_1, ids_2, cfg_1, cfg_2)
    ne, np_ = encode_prompt_sdxl(params_1, params_2, neg_ids_1, neg_ids_2,
                                 cfg_1, cfg_2)
    return pe, ne, pp, np_


def make_empty_prompt_conditioning(
    params_1: Dict, params_2: Dict,
    cfg_1: CLIPTextConfig = None, cfg_2: CLIPTextConfig = None,
    resolution: int = 1024,
):
    """Cache the empty-prompt SDXL conditioning once, as the reference does
    at init (stable_diffusion/network.py:114-168 init_empty_prompts):
    pooled embeds become `add_text_embeds`; `add_time_ids` packs
    (original_size, crop_topleft, target_size) at resolution 1024.

    Returns (prompt_embeds [1, 77, 2048], add_text_embeds [1, 1280],
    add_time_ids [1, 6]) — feed the latter two into sd_network_init.
    """
    cfg_1 = cfg_1 or clip_l_config()
    cfg_2 = cfg_2 or open_clip_bigg_config()
    ids_1 = empty_prompt_ids(cfg_1)
    ids_2 = empty_prompt_ids(cfg_2)
    prompt_embeds, pooled = encode_prompt_sdxl(
        params_1, params_2, ids_1, ids_2, cfg_1, cfg_2
    )
    r = float(resolution)
    add_time_ids = jnp.asarray([[r, r, 0.0, 0.0, r, r]], jnp.float32)
    return prompt_embeds, pooled, add_time_ids

"""CLIP BPE tokenizer (pure python, HF-compatible).

The reference tokenizes prompts with HF AutoTokenizer (reference
stable_diffusion/network.py:35-40); only the empty prompt is ever used on
the main path (network.py:115-117) — covered without any files by
``clip_text.empty_prompt_ids``.  This module completes the surface for
arbitrary prompts: a CLIP byte-level BPE that loads ``vocab.json`` +
``merges.txt`` from a tokenizer directory (HF hub layout), matching
transformers.CLIPTokenizer token-for-token (parity-tested against it on
synthetic vocabularies).

No ftfy dependency: inputs are assumed to be well-formed unicode (HF only
uses ftfy for mojibake repair).
"""

from __future__ import annotations

import functools
import html
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

try:
    import regex as _re
except ImportError:  # pragma: no cover
    import re as _re

_PAT = _re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+"
    r"|[\p{N}]|[^\s\p{L}\p{N}]+",
    _re.IGNORECASE,
)


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte → printable-unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


class CLIPTokenizer:
    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 bos_token: str = "<|startoftext|>",
                 eos_token: str = "<|endoftext|>",
                 pad_token: Optional[str] = None,
                 model_max_length: int = 77):
        self.vocab = vocab
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.bos_token, self.eos_token = bos_token, eos_token
        self.pad_token = pad_token or eos_token
        self.model_max_length = model_max_length
        self.cache: Dict[str, str] = {
            bos_token: bos_token, eos_token: eos_token
        }

    @classmethod
    def from_dir(cls, path: str, **kw) -> "CLIPTokenizer":
        """Load from an HF tokenizer directory (vocab.json + merges.txt)."""
        with open(os.path.join(path, "vocab.json")) as f:
            vocab = json.load(f)
        with open(os.path.join(path, "merges.txt"), encoding="utf-8") as f:
            lines = f.read().split("\n")
        # first line is the version header
        merges = [tuple(l.split()) for l in lines[1:] if len(l.split()) == 2]
        cfg_path = os.path.join(path, "special_tokens_map.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                sp = json.load(f)

            def name(tok):
                v = sp.get(tok)
                return v["content"] if isinstance(v, dict) else v

            kw.setdefault("pad_token", name("pad_token"))
        return cls(vocab, merges, **kw)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def _clean(self, text: str) -> str:
        text = html.unescape(html.unescape(text))
        text = " ".join(text.split())
        return text.strip().lower()

    def encode(self, text: str) -> List[int]:
        """Text → BPE ids (no special tokens)."""
        ids: List[int] = []
        for token in _PAT.findall(self._clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.vocab[t] for t in self.bpe(token).split(" "))
        return ids

    def __call__(self, texts, max_length: Optional[int] = None) -> np.ndarray:
        """Batch-tokenize with bos/eos + pad/truncate to max_length.

        Returns [B, max_length] int32 (HF padding='max_length',
        truncation=True semantics).
        """
        if isinstance(texts, str):
            texts = [texts]
        L = max_length or self.model_max_length
        bos = self.vocab[self.bos_token]
        eos = self.vocab[self.eos_token]
        pad = self.vocab[self.pad_token]
        out = np.full((len(texts), L), pad, np.int32)
        for i, t in enumerate(texts):
            ids = [bos] + self.encode(t)[: L - 2] + [eos]
            out[i, : len(ids)] = ids
        return out

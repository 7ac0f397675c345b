"""CLIP BPE tokenizer parity vs transformers.CLIPTokenizer on a synthetic
vocabulary (the real vocab files are unavailable offline)."""

import json
import os

import numpy as np
import pytest

from stable_nerf_tpu.models.diffusion.tokenizer import CLIPTokenizer, _bytes_to_unicode

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Tiny CLIP-style vocab: single-byte tokens + a few merges."""
    d = tmp_path_factory.mktemp("tok")
    b2u = _bytes_to_unicode()
    chars = sorted(set(b2u.values()))
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [
        ("h", "e"), ("l", "l"), ("o</w>", ""), ("he", "ll"),
        ("hell", "o</w>"), ("w", "o"), ("r", "l"), ("wo", "rl"),
        ("worl", "d</w>"), ("a</w>", ""),
    ]
    # keep only well-formed 2-token merges whose parts exist progressively
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("w", "o"), ("r", "l"),
              ("wo", "rl"), ("t", "h"), ("th", "e</w>")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


def hf_tok(tok_dir):
    return transformers.CLIPTokenizer(
        vocab_file=os.path.join(tok_dir, "vocab.json"),
        merges_file=os.path.join(tok_dir, "merges.txt"),
    )


class TestParity:
    prompts = [
        "",
        "hello world",
        "The  quick   brown fox!",
        "a photo of the 3 cats, isn't it?",
        "HELLO THERE",
    ]

    def test_encode_matches_hf(self, tok_dir):
        ours = CLIPTokenizer.from_dir(tok_dir)
        theirs = hf_tok(tok_dir)
        for p in self.prompts:
            a = ours.encode(p)
            b = theirs(p, add_special_tokens=False)["input_ids"]
            assert a == b, (p, a, b)

    def test_padded_batch_matches_hf(self, tok_dir):
        ours = CLIPTokenizer.from_dir(tok_dir)
        theirs = hf_tok(tok_dir)
        out = ours(self.prompts, max_length=20)
        ref = theirs(self.prompts, padding="max_length", truncation=True,
                     max_length=20)["input_ids"]
        np.testing.assert_array_equal(out, np.asarray(ref))

    def test_empty_prompt_structure(self, tok_dir):
        ours = CLIPTokenizer.from_dir(tok_dir)
        ids = ours("", max_length=8)[0]
        bos = ours.vocab["<|startoftext|>"]
        eos = ours.vocab["<|endoftext|>"]
        assert ids[0] == bos and ids[1] == eos
        assert all(i == eos for i in ids[2:])   # pads with eos by default

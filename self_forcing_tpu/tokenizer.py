"""Tokenizer wrapper (reference wan/modules/tokenizers.py:36-82).

Wraps a HuggingFace tokenizer with the reference's text cleaning modes
('whitespace' | 'lower' | 'canonicalize') and fixed-length padding.
ftfy is not in this image; the canonicalize path degrades to
unicode-NFKC + html unescape, which covers the reference's usage (the
shipped configs use clean='whitespace').
"""
from __future__ import annotations

import html
import re
import string
import unicodedata
from typing import List

import numpy as np


def basic_clean(text: str) -> str:
    # reference uses ftfy.fix_text; NFKC + unescape approximates it
    text = unicodedata.normalize("NFKC", text)
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def canonicalize(text: str, keep_punctuation_exact_string=None) -> str:
    text = text.replace("_", " ")
    if keep_punctuation_exact_string:
        text = keep_punctuation_exact_string.join(
            part.translate(str.maketrans("", "", string.punctuation))
            for part in text.split(keep_punctuation_exact_string))
    else:
        text = text.translate(str.maketrans("", "", string.punctuation))
    text = text.lower()
    return re.sub(r"\s+", " ", text).strip()


class HuggingfaceTokenizer:
    """name: local path or HF id of the tokenizer (e.g. google/umt5-xxl);
    seq_len: fixed padded length (512 for Wan's T5,
    utils/wan_wrapper.py:34-35)."""

    def __init__(self, name: str, seq_len: int | None = None,
                 clean: str | None = "whitespace", **kwargs):
        from transformers import AutoTokenizer
        self.name = name
        self.seq_len = seq_len
        self.clean = clean
        self.tokenizer = AutoTokenizer.from_pretrained(name, **kwargs)
        self.vocab_size = self.tokenizer.vocab_size

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            return whitespace_clean(basic_clean(text))
        if self.clean == "lower":
            return whitespace_clean(basic_clean(text)).lower()
        if self.clean == "canonicalize":
            return canonicalize(basic_clean(text))
        return text

    def __call__(self, sequence: List[str] | str, return_mask: bool = True,
                 **kwargs):
        if isinstance(sequence, str):
            sequence = [sequence]
        sequence = [self._clean(s) for s in sequence]
        kwargs.setdefault("padding",
                          "max_length" if self.seq_len else "longest")
        kwargs.setdefault("truncation", bool(self.seq_len))
        if self.seq_len:
            kwargs.setdefault("max_length", self.seq_len)
        out = self.tokenizer(sequence, return_tensors="np", **kwargs)
        ids = out["input_ids"].astype(np.int32)
        mask = out["attention_mask"].astype(np.int32)
        if return_mask:
            return ids, mask
        return ids

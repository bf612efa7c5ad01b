"""Self-contained CLIP BPE tokenizer.

Replaces ``transformers.CLIPTokenizer`` (reference: cli_lora_pti.py:56-60,
dataset.py:229-234) without the transformers dependency: loads
``vocab.json`` + ``merges.txt`` from a local tokenizer directory (the
``tokenizer/`` subfolder of a diffusers model dir) and implements the CLIP
text cleanup + byte-pair encoding, ``<|startoftext|>``/``<|endoftext|>``
wrapping, model_max_length=77, and added-token support for textual-inversion
placeholders (reference: tokenizer.add_tokens, cli_lora_pti.py:76-84).
"""

from __future__ import annotations

import functools
import html
import json
import os
import re
import threading
from typing import Dict, List, Optional, Sequence, Union

__all__ = ["CLIPTokenizer"]


@functools.lru_cache()
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte->unicode table (same as CLIP's)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _whitespace_clean(text: str) -> str:
    text = re.sub(r"\s+", " ", text)
    return text.strip()


# CLIP's word pattern needs the \p{L}/\p{N} Unicode classes (third-party
# `regex` module); fall back to ASCII classes when it is unavailable —
# accented/non-Latin prompts then tokenize differently from HF.
try:
    import regex as _regex

    _PAT = _regex.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _regex.IGNORECASE,
    )
except ImportError:  # pragma: no cover
    _PAT = re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
        re.IGNORECASE,
    )


class CLIPTokenizer:
    """Minimal-but-faithful CLIP tokenizer.

    ``__call__`` mirrors the HF interface subset the reference uses:
    ``padding`` in {"do_not_pad", "max_length"}, ``truncation``,
    ``max_length``, returning ``{"input_ids": ...}``.
    """

    model_max_length = 77

    def __init__(self, vocab: Dict[str, int], merges: List[str]):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in self.encoder.items()}
        merge_pairs = [tuple(m.split()) for m in merges if m and not m.startswith("#")]
        self.bpe_ranks = dict(zip(merge_pairs, range(len(merge_pairs))))
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.bos_token = "<|startoftext|>"
        self.eos_token = "<|endoftext|>"
        self.pad_token = "<|endoftext|>"
        self.unk_token = "<|endoftext|>"  # HF CLIPTokenizer default
        self.added_tokens: Dict[str, int] = {}
        self._added_pattern: Optional[re.Pattern] = None
        # Serving registers TI adapters (add_tokens) concurrently with
        # worker-thread tokenization; this keeps vocab mutation atomic with
        # respect to encode/decode (scripts/serve.py POST /adapters).
        self._vocab_lock = threading.RLock()

    # -- construction -------------------------------------------------------
    @classmethod
    def from_pretrained(cls, tokenizer_dir: str, subfolder: Optional[str] = None):
        if subfolder:
            tokenizer_dir = os.path.join(tokenizer_dir, subfolder)
        with open(os.path.join(tokenizer_dir, "vocab.json")) as f:
            vocab = json.load(f)
        with open(os.path.join(tokenizer_dir, "merges.txt"), encoding="utf-8") as f:
            merges = f.read().split("\n")
        if merges and merges[0].startswith("#"):
            merges = merges[1:]
        tok = cls(vocab, merges)
        added_path = os.path.join(tokenizer_dir, "added_tokens.json")
        if os.path.exists(added_path):
            with open(added_path) as f:
                for t, i in json.load(f).items():
                    tok.added_tokens[t] = int(i)
        return tok

    # -- vocab management ---------------------------------------------------
    def __len__(self) -> int:
        return len(self.encoder) + len(self.added_tokens)

    @property
    def bos_token_id(self) -> int:
        return self.encoder[self.bos_token]

    @property
    def eos_token_id(self) -> int:
        return self.encoder[self.eos_token]

    def add_tokens(self, tokens: Union[str, Sequence[str]]) -> int:
        """Returns the number of tokens actually added (HF semantics —
        the reference's collision-rename loop depends on 0 for existing
        tokens, lora.py:636-645)."""
        if isinstance(tokens, str):
            tokens = [tokens]
        with self._vocab_lock:
            added = 0
            for t in tokens:
                if t in self.encoder or t in self.added_tokens:
                    continue
                self.added_tokens[t] = len(self.encoder) + len(self.added_tokens)
                added += 1
            if added:
                self._added_pattern = None  # invalidate the cached pattern
            return added

    def convert_tokens_to_ids(self, token: Union[str, Sequence[str]]):
        if isinstance(token, (list, tuple)):
            return [self.convert_tokens_to_ids(t) for t in token]
        if token in self.added_tokens:
            return self.added_tokens[token]
        return self.encoder.get(token, self.encoder.get(self.eos_token))

    # -- BPE ---------------------------------------------------------------
    def _bpe(self, token: str) -> str:
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
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
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

    def _added_tokens_pattern(self):
        """Compiled added-token split pattern, cached (tokenization is the
        per-example hot path; rebuilding the alternation every call is
        wasted work).  Invalidated by :meth:`add_tokens`."""
        if self._added_pattern is None and self.added_tokens:
            self._added_pattern = re.compile(
                "(" + "|".join(
                    re.escape(t) for t in
                    sorted(self.added_tokens, key=len, reverse=True)) + ")"
            )
        return self._added_pattern

    def _tokenize_text(self, text: str) -> List[int]:
        ids: List[int] = []
        text = _whitespace_clean(html.unescape(html.unescape(text)))
        # split out added tokens BEFORE lowercasing — HF matches added
        # tokens case-sensitively on the raw text (so <TOK> placeholders
        # work); only the remaining chunks get CLIP's lowercase treatment
        pattern = self._added_tokens_pattern()
        chunks = pattern.split(text) if pattern is not None else [text]
        # HF maps out-of-vocab BPE symbols to the unk token rather than
        # dropping them (CLIPTokenizer: encoder.get(token, encoder[unk]))
        unk_id = self.encoder.get(self.unk_token, len(self.encoder) - 1)
        for chunk in chunks:
            if not chunk:
                continue
            if chunk in self.added_tokens:
                ids.append(self.added_tokens[chunk])
                continue
            chunk = chunk.lower()
            for token in _PAT.findall(chunk):
                token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
                ids.extend(self.encoder.get(t, unk_id)
                           for t in self._bpe(token).split(" "))
        return ids

    # -- HF-style call ------------------------------------------------------
    def __call__(
        self,
        text: Union[str, Sequence[str]],
        padding: str = "do_not_pad",
        truncation: bool = False,
        max_length: Optional[int] = None,
        return_tensors: Optional[str] = None,
    ):
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        max_length = max_length or self.model_max_length
        all_ids = []
        with self._vocab_lock:
            for t in texts:
                ids = ([self.bos_token_id] + self._tokenize_text(t)
                       + [self.eos_token_id])
                if truncation and len(ids) > max_length:
                    ids = ids[: max_length - 1] + [self.eos_token_id]
                if padding == "max_length":
                    ids = ids + ([self.encoder[self.pad_token]]
                                 * (max_length - len(ids)))
                all_ids.append(ids)
        if return_tensors == "np":
            import numpy as np

            return {"input_ids": np.asarray(all_ids, dtype=np.int32)}
        return {"input_ids": all_ids[0] if single else all_ids}

    def decode(self, ids: Sequence[int]) -> str:
        toks = []
        with self._vocab_lock:
            for i in ids:
                tok = self.decoder.get(int(i)) or next(
                    (t for t, j in self.added_tokens.items() if j == int(i)),
                    "")
                toks.append(tok)
        text = "".join(toks)
        text = bytearray(
            self.byte_decoder.get(c, ord(" ")) for c in text.replace("</w>", " ")
            if c in self.byte_decoder or c == " "
        ).decode("utf-8", errors="replace")
        return text.strip()

    @staticmethod
    def tiny(extra_words: Sequence[str] = ()) -> "CLIPTokenizer":
        """Small synthetic tokenizer for tests: ascii chars + given words."""
        byte_syms = list(_bytes_to_unicode().values())
        vocab = {}
        for s in byte_syms:
            vocab[s] = len(vocab)
        for s in byte_syms:
            vocab[s + "</w>"] = len(vocab)
        merges = []
        for w in extra_words:
            sym = w + "</w>"
            if sym not in vocab:
                # build merges chain: a b -> ab ... full word
                acc = w[0]
                for ch in w[1:-1]:
                    merges.append(f"{acc} {ch}")
                    acc += ch
                    if acc not in vocab:
                        vocab[acc] = len(vocab)
                merges.append(f"{acc} {w[-1]}</w>")
                vocab[sym] = len(vocab)
        vocab["<|startoftext|>"] = len(vocab)
        vocab["<|endoftext|>"] = len(vocab)
        return CLIPTokenizer(vocab, merges)

"""CLIP byte-level BPE tokenizer machinery (data/tokenizer.py) and the
prompt-template table (retrieval/prompts.py).

Exact token-id parity with OpenAI CLIP requires the real
bpe_simple_vocab_16e6 merges asset (loaded at runtime via
CLIPTokenizer.from_file); these tests pin the algorithm itself — byte
mapping, merge-by-rank order, the tokenize() framing contract — with a
synthetic merge table."""
import gzip

import numpy as np

from zutis_tpu.data.tokenizer import (
    CLIPTokenizer,
    basic_clean,
    bytes_to_unicode,
    whitespace_clean,
)
from zutis_tpu.retrieval.prompts import PROMPT_TEMPLATES


def _toy_tokenizer():
    # merges over the printable byte units, ranked: ("c","a") first, then
    # ("ca","t</w>") -> "cat</w>" exists as one token
    return CLIPTokenizer([("c", "a"), ("ca", "t</w>"), ("d", "o")])


def test_bytes_to_unicode_invertible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    inv = {v: k for k, v in m.items()}
    assert all(inv[m[b]] == b for b in range(256))


def test_vocab_layout_matches_clip_formula():
    tok = _toy_tokenizer()
    # 256 bytes + 256 byte+'</w>' + merges + SOT/EOT
    assert len(tok.encoder) == 256 + 256 + 3 + 2
    assert tok.sot_id == len(tok.encoder) - 2
    assert tok.eot_id == len(tok.encoder) - 1


def test_bpe_merges_apply_in_rank_order():
    tok = _toy_tokenizer()
    assert tok.bpe("cat") == "cat</w>"   # two merges collapse fully
    # ("d","o") merges but ("do","t</w>") has no rank -> stays split
    assert tok.bpe("dot") == "do t</w>"
    # unknown pairs stay as byte units + terminal
    assert tok.bpe("xy") == "x y</w>"


def test_encode_and_framing():
    tok = _toy_tokenizer()
    ids = tok.encode("Cat  CAT\tcat")
    # cleaning lower-cases and collapses whitespace -> three identical words
    assert len(ids) == 3 and len(set(ids)) == 1
    assert ids[0] == tok.encoder["cat</w>"]

    arr = tok.tokenize(["cat", "cat cat"], context_length=6)
    assert arr.shape == (2, 6) and arr.dtype == np.int32
    assert arr[0, 0] == tok.sot_id and arr[0, 2] == tok.eot_id
    assert arr[0, 3:].sum() == 0  # zero padding
    assert arr[1, 3] == tok.eot_id

    long = tok.tokenize(["cat " * 20], context_length=5, truncate=True)
    assert long.shape == (1, 5) and long[0, -1] == tok.eot_id


def test_from_file_reads_gz_with_header(tmp_path):
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("#version header\nc a\nca t</w>\n")
    tok = CLIPTokenizer.from_file(str(p), n_merges=2)
    assert tok.bpe("cat") == "cat</w>"


def test_clean_helpers():
    assert basic_clean("&amp;amp; hi ") == "& hi"
    assert whitespace_clean("a\t\n  b   c") == "a b c"


def test_prompt_templates_table():
    """The retrieval prompt set: 85 templates, each with one format slot
    (reference utils/extract_text_embeddings.py:9-95)."""
    assert len(PROMPT_TEMPLATES) == 85
    assert len(set(PROMPT_TEMPLATES)) == 85
    for t in PROMPT_TEMPLATES:
        assert t.count("{}") == 1, t
        assert t.format("dog")  # formats cleanly


def test_underscore_is_a_symbol_token():
    """CLIP's [^\\s\\p{L}\\p{N}]+ treats '_' as a symbol run; a \\w-based
    translation silently dropped it ("great_white_shark" tokenized as if
    the text were 'greatwhiteshark' in letter runs)."""
    tok = _toy_tokenizer()
    with_us = tok.encode("great_white_shark")
    without = tok.encode("greatwhiteshark")
    assert with_us != without
    # the underscore byte itself is tokenized (as a symbol run), not lost
    from zutis_tpu.data.tokenizer import bytes_to_unicode
    us_unit = bytes_to_unicode()[ord("_")]
    inv = {i: t for t, i in tok.encoder.items()}
    assert any(us_unit in inv.get(t, "") for t in with_us)

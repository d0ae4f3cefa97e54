"""Property-based round-trip tests (hypothesis) for the pure codec layers:
vbyte, bit packing, PFC front coding, and the full HDT container stack.
These run without Spark, so they fuzz broadly and fast."""

from __future__ import annotations

import io

from hypothesis import given, settings, strategies as st

from hdtspark import hdt_binary as hb

terms_st = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",),
                               blacklist_characters="\x00"),
        min_size=1, max_size=40),
    min_size=1, max_size=80, unique=True,
).map(sorted)


@given(st.integers(min_value=0, max_value=2**62))
def test_vbyte_roundtrip(n):
    assert hb.vbyte_decode(hb.vbyte_encode(n))[0] == n


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=200))
def test_sequence_roundtrip(vals):
    buf = io.BytesIO()
    hb.write_sequence(buf, vals)
    buf.seek(0)
    assert hb.read_sequence(buf) == vals


@given(st.lists(st.booleans(), max_size=500))
def test_bitmap_roundtrip(bits):
    buf = io.BytesIO()
    hb.write_bitmap(buf, bits)
    buf.seek(0)
    assert hb.read_bitmap(buf) == bits


@settings(max_examples=50)
@given(terms_st, st.integers(min_value=1, max_value=16))
def test_pfc_section_roundtrip(terms, block_size):
    buf = io.BytesIO()
    hb.write_pfc_section(buf, terms, block_size=block_size)
    buf.seek(0)
    assert hb.read_pfc_section(buf) == terms


@settings(max_examples=30)
@given(st.lists(
    st.tuples(st.integers(1, 20), st.integers(1, 10), st.integers(1, 50)),
    min_size=1, max_size=100, unique=True))
def test_triple_layers_roundtrip(triples):
    # layers require sorted SPO with contiguous subject ids 1..n
    subs = sorted({s for s, _, _ in triples})
    remap = {s: i + 1 for i, s in enumerate(subs)}
    spo = sorted({(remap[s], p, o) for s, p, o in triples})
    layers = hb._triples_to_layers(spo)
    assert hb._layers_to_triples(*layers) == spo


@settings(max_examples=40)
@given(st.lists(st.integers(0, 2**24 - 1), min_size=0, max_size=60),
       st.integers(1, 64))
def test_pack_bits_chunking_is_byte_exact(vals, bits):
    """Chunked packing == one-shot packing for any chunk size that is a
    multiple of 8 (no cross-chunk bit carries)."""
    import hdtspark.hdt_binary as hb2
    vals = [v & ((1 << bits) - 1) for v in vals]
    whole = hb2.pack_bits(vals, bits)
    old = hb2._PACK_CHUNK
    try:
        hb2._PACK_CHUNK = 8  # force many chunk boundaries
        chunked = hb2.pack_bits(vals, bits)
        assert chunked == whole
        assert hb2.unpack_bits(chunked, bits, len(vals)) == vals
    finally:
        hb2._PACK_CHUNK = old

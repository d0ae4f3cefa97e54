"""HDT binary file format: read and write (reference S1/S2,
``Hdt::read`` src/hdt.rs:79-89 and ``Hdt::write`` src/hdt.rs:195-202; format
spec at https://www.rdfhdt.org/hdt-binary-format/ with the deviations the
reference documents in-tree).

Layout of a ``.hdt`` file (SPO order, four-section dictionary, PFC
sections — the only variant the reference supports):

    Global ControlInfo                  ($HDT cookie, CRC16-ARC)
    Header ControlInfo + N-Triples body (length property)
    Dictionary ControlInfo              (<.../hdt#dictionaryFour>)
      4 x PFC section                   (shared, subjects, predicates,
                                         objects; CRC8 meta + CRC32C data)
    Triples ControlInfo                 (<.../hdt#triplesBitmap>, order=1)
      bitmap_y, bitmap_z                (last-of-group bits, LSB-first LE)
      sequence_y, sequence_z            (Log64 bit-packed predicate/object ids)

This module is DRIVER-SIDE and single-node by design: HDT binary is a
sequential single-file format (the distributed representation here is the
parquet/Iceberg warehouse, checkpoint.py); this is the interop bridge so a
downstream consumer of the reference can read this pipeline's output and
real-world ``.hdt`` artifacts can be imported.  All helpers are pure and
byte-golden-tested (vbyte, CRCs, bit packing, PFC blocks, sequences).

Quirk preserved for compatibility: the HDT vbyte shifts by 7 for EVERY
continuation byte (the reference documents the same historical off-by-one,
src/containers/vbyte.rs:25-31); the most significant bit marks the LAST
byte, not continuation.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field

HDT_COOKIE = b"$HDT"
FORMAT_CONTAINER = "<http://purl.org/HDT/hdt#HDTv1>"
FORMAT_DICT_FOUR = "<http://purl.org/HDT/hdt#dictionaryFour>"
FORMAT_TRIPLES_BITMAP = "<http://purl.org/HDT/hdt#triplesBitmap>"

TYPE_GLOBAL, TYPE_HEADER, TYPE_DICTIONARY, TYPE_TRIPLES, TYPE_INDEX = 1, 2, 3, 4, 5
BLOCK_SIZE = 16


# --- integer codecs ----------------------------------------------------------

def vbyte_encode(n: int) -> bytes:
    """HDT vbyte: 7-bit little-endian groups; MSB set marks the LAST byte."""
    out = bytearray()
    while n > 127:
        out.append(n & 127)
        n >>= 7
    out.append(n | 0x80)
    return bytes(out)


def vbyte_decode(data: bytes, pos: int = 0) -> tuple[int, int]:
    """-> (value, next_pos)."""
    n, shift = 0, 0
    while not data[pos] & 0x80:
        n |= (data[pos] & 127) << shift
        shift += 7
        pos += 1
    n |= (data[pos] & 127) << shift
    return n, pos + 1


def _read_vbyte(fh) -> tuple[int, bytes]:
    n, shift, raw = 0, 0, bytearray()
    while True:
        b = fh.read(1)[0]
        raw.append(b)
        n |= (b & 127) << shift
        if b & 0x80:
            return n, bytes(raw)
        shift += 7


# --- CRCs (public algorithms; parameters match the reference's crc crate) ---

def _make_table_crc8_smbus():
    # poly 0x07, init 0, xorout 0, unreflected
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
        table.append(c)
    return table


def _make_table_crc16_arc():
    # poly 0x8005 reflected (0xA001), init 0, xorout 0
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ 0xA001 if c & 1 else c >> 1
        table.append(c)
    return table


def _make_table_crc32c():
    # CRC-32/ISCSI: poly 0x1EDC6F41 reflected (0x82F63B78), init/xorout all-1s
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        table.append(c)
    return table


_T8, _T16, _T32 = _make_table_crc8_smbus(), _make_table_crc16_arc(), _make_table_crc32c()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _T8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _T16[(c ^ b) & 0xFF] ^ (c >> 8)
    return c


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _T32[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# --- bit packing (little-endian bitstream, LSB first — Log64/Bitmap layout) --

_PACK_CHUNK = 1 << 20  # rows per numpy chunk; multiple of 8 so every chunk's
                       # bit count is byte-aligned and chunks concatenate
                       # without cross-chunk bit carries.


def pack_bits(values: list[int], bits: int) -> bytes:
    """Pack values LSB-first into a little-endian bitstream,
    ceil(len*bits/8) bytes (the byte image of the reference's u64 LE words
    with trailing zero bytes dropped).

    Vectorized per chunk (numpy packbits) — a single Python bigint
    accumulator is O(n^2) and takes hours at the 10M+ value sizes the
    sequence layers reach."""
    total_bits = bits * len(values)
    if not total_bits:
        return b""
    import numpy as np

    out = bytearray()
    shifts = np.arange(bits, dtype=np.uint64)
    for i0 in range(0, len(values), _PACK_CHUNK):
        arr = np.asarray(values[i0:i0 + _PACK_CHUNK], dtype=np.uint64)
        bit_mat = ((arr[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        out += np.packbits(bit_mat.reshape(-1), bitorder="little").tobytes()
    return bytes(out[:(total_bits + 7) // 8])


def unpack_bits(data: bytes, bits: int, n: int) -> list[int]:
    if bits == 0 or n == 0:
        return [0] * n
    import numpy as np

    bit_arr = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                            bitorder="little")[: n * bits]
    vals = np.zeros(n, dtype=np.uint64)
    # accumulate bit-plane by bit-plane: no (n, bits) uint64 intermediate
    for b in range(bits):
        vals |= bit_arr[b::bits].astype(np.uint64) << np.uint64(b)
    return vals.tolist()


def bit_width(n: int) -> int:
    return n.bit_length()


# --- ControlInfo -------------------------------------------------------------

@dataclass
class ControlInfo:
    control_type: int
    format: str = ""
    properties: dict[str, str] = field(default_factory=dict)

    def write(self, fh) -> None:
        buf = bytearray()
        buf += HDT_COOKIE
        buf.append(self.control_type)
        buf += self.format.encode() + b"\x00"
        props = "".join(f"{k}={v};" for k, v in self.properties.items())
        buf += props.encode() + b"\x00"
        fh.write(bytes(buf))
        fh.write(crc16(bytes(buf)).to_bytes(2, "little"))

    @classmethod
    def read(cls, fh) -> "ControlInfo":
        hist = bytearray()
        cookie = fh.read(4)
        if cookie != HDT_COOKIE:
            raise ValueError(f"bad HDT cookie {cookie!r}")
        hist += cookie
        t = fh.read(1)
        if not t:
            raise ValueError("unexpected EOF in ControlInfo (missing type)")
        hist += t

        def scan_nul_terminated() -> bytearray:
            # b'' from read(1) means EOF before the terminator: corrupt or
            # truncated input must raise, not spin forever.
            out = bytearray()
            while True:
                b = fh.read(1)
                if not b:
                    raise ValueError("unexpected EOF in ControlInfo")
                hist.extend(b)
                if b == b"\x00":
                    return out
                out += b

        fmt = scan_nul_terminated()
        props_raw = scan_nul_terminated()
        crc_code = int.from_bytes(fh.read(2), "little")
        if crc16(bytes(hist)) != crc_code:
            raise ValueError("ControlInfo CRC16 mismatch")
        props = {}
        for item in props_raw.decode().split(";"):
            if "=" in item:
                k, v = item.split("=", 1)
                props[k] = v
        return cls(t[0], fmt.decode(), props)


# --- Log64 sequence ----------------------------------------------------------

def _write_sequence_body(fh, body: bytes, bits: int, n: int) -> None:
    meta = bytearray([0x01, bits])
    meta += vbyte_encode(n)
    fh.write(bytes(meta))
    fh.write(bytes([crc8(bytes(meta))]))
    fh.write(body)
    fh.write(crc32c(body).to_bytes(4, "little"))


def write_sequence(fh, values: list[int]) -> None:
    bits = bit_width(max(values)) if values else 0
    _write_sequence_body(fh, pack_bits(values, bits), bits, len(values))


def read_sequence(fh) -> list[int]:
    hist = bytearray(fh.read(2))
    if hist[0] != 0x01:
        raise ValueError(f"unsupported sequence type {hist[0]}")
    bits = hist[1]
    entries, raw = _read_vbyte(fh)
    hist += raw
    if crc8(bytes(hist)) != fh.read(1)[0]:
        raise ValueError("sequence CRC8 mismatch")
    body = fh.read((bits * entries + 7) // 8)
    crc_code = int.from_bytes(fh.read(4), "little")
    if crc32c(body) != crc_code:
        raise ValueError("sequence CRC32C mismatch")
    return unpack_bits(body, bits, entries) if bits else [0] * entries


# --- Bitmap ------------------------------------------------------------------

def _write_bitmap_body(fh, body: bytes, n: int) -> None:
    meta = bytearray([0x01])
    meta += vbyte_encode(n)
    fh.write(bytes(meta))
    fh.write(bytes([crc8(bytes(meta))]))
    fh.write(body)
    fh.write(crc32c(body).to_bytes(4, "little"))


def write_bitmap(fh, bits: list[bool]) -> None:
    _write_bitmap_body(fh, pack_bits([1 if b else 0 for b in bits], 1),
                       len(bits))


def read_bitmap(fh) -> list[bool]:
    hist = bytearray(fh.read(1))
    if hist[0] != 0x01:
        raise ValueError(f"unsupported bitmap type {hist[0]}")
    n, raw = _read_vbyte(fh)
    hist += raw
    if crc8(bytes(hist)) != fh.read(1)[0]:
        raise ValueError("bitmap CRC8 mismatch")
    body = fh.read((n + 7) // 8)
    crc_code = int.from_bytes(fh.read(4), "little")
    if crc32c(body) != crc_code:
        raise ValueError("bitmap CRC32C mismatch")
    return [bool(v) for v in unpack_bits(body, 1, n)]


# --- Plain-Front-Coded dictionary section ------------------------------------

def pfc_compress(terms, block_size: int = BLOCK_SIZE) -> tuple[bytes, list[int]]:
    """terms (any iterable, consumed sequentially) -> (packed bytes, block
    offsets incl. the final end offset).

    Block layout (src/dict_sect_pfc.rs:351-386 semantics): every
    ``block_size``-th term is stored whole; the rest as
    vbyte(shared-prefix-len) + suffix; each term null-terminated.
    Memory is bounded by the PACKED image (front-coded), never a term list.
    """
    packed = bytearray()
    offsets: list[int] = []
    last = b""
    n = 0
    for i, term in enumerate(terms):
        t = term.encode()
        if i % block_size == 0:
            offsets.append(len(packed))
            packed += t
        else:
            common = 0
            for a, b in zip(last, t):
                if a != b:
                    break
                common += 1
            packed += vbyte_encode(common)
            packed += t[common:]
        packed.append(0)
        last = t
        n = i + 1
    if n:
        offsets.append(len(packed))
    return bytes(packed), offsets


def write_pfc_section(fh, terms, block_size: int = BLOCK_SIZE,
                      n_terms: int | None = None) -> None:
    """``terms`` may be a list or a single-pass iterator; pass ``n_terms``
    with an iterator (the count is written before the data)."""
    if n_terms is None:
        terms = list(terms)
        n_terms = len(terms)
    packed, offsets = pfc_compress(terms, block_size)
    meta = bytearray([0x02])
    meta += vbyte_encode(n_terms)
    meta += vbyte_encode(len(packed))
    meta += vbyte_encode(block_size)
    fh.write(bytes(meta))
    fh.write(bytes([crc8(bytes(meta))]))
    write_sequence(fh, offsets)
    fh.write(packed)
    fh.write(crc32c(packed).to_bytes(4, "little"))


def read_pfc_section(fh) -> list[str]:
    hist = bytearray(fh.read(1))
    if hist[0] != 0x02:
        raise ValueError(f"dictionary section is not PFC (type {hist[0]})")
    num_strings, raw = _read_vbyte(fh)
    hist += raw
    packed_len, raw = _read_vbyte(fh)
    hist += raw
    block_size, raw = _read_vbyte(fh)
    hist += raw
    if crc8(bytes(hist)) != fh.read(1)[0]:
        raise ValueError("PFC CRC8 mismatch")
    read_sequence(fh)  # block offsets — recomputable from the packed data
    packed = fh.read(packed_len)
    crc_code = int.from_bytes(fh.read(4), "little")
    if crc32c(packed) != crc_code:
        raise ValueError("PFC CRC32C mismatch")

    terms: list[str] = []
    pos, last = 0, b""
    for i in range(num_strings):
        if i % block_size == 0:
            end = packed.index(0, pos)
            last = packed[pos:end]
            pos = end + 1
        else:
            common, pos = vbyte_decode(packed, pos)
            end = packed.index(0, pos)
            last = last[:common] + packed[pos:end]
            pos = end + 1
        terms.append(last.decode())
    return terms


# --- header (VOID + format metadata, reference fill_header src/nt.rs:47-113
# with the IRIs of src/vocab.rs:1-24 — all public HDT/VOID vocabulary) -------

VOCAB = {
    "HDT_CONTAINER": "http://purl.org/HDT/hdt#HDTv1",
    "VOID_DATASET": "http://rdfs.org/ns/void#Dataset",
    "VOID_TRIPLES": "http://rdfs.org/ns/void#triples",
    "VOID_PROPERTIES": "http://rdfs.org/ns/void#properties",
    "VOID_DISTINCT_SUBJECTS": "http://rdfs.org/ns/void#distinctSubjects",
    "VOID_DISTINCT_OBJECTS": "http://rdfs.org/ns/void#distinctObjects",
    "RDF_TYPE": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
    "HDT_STATISTICAL_INFORMATION": "http://purl.org/HDT/hdt#statisticalInformation",
    "HDT_PUBLICATION_INFORMATION": "http://purl.org/HDT/hdt#publicationInformation",
    "HDT_FORMAT_INFORMATION": "http://purl.org/HDT/hdt#formatInformation",
    "HDT_DICTIONARY": "http://purl.org/HDT/hdt#dictionary",
    "HDT_TRIPLES": "http://purl.org/HDT/hdt#triples",
    "DC_TERMS_FORMAT": "http://purl.org/dc/terms/format",
    "HDT_NUM_TRIPLES": "http://purl.org/HDT/hdt#triplesnumTriples",
    "HDT_TRIPLES_ORDER": "http://purl.org/HDT/hdt#triplesOrder",
    "HDT_DICT_SHARED_SO": "http://purl.org/HDT/hdt#dictionarynumSharedSubjectObject",
    "HDT_DICT_MAPPING": "http://purl.org/HDT/hdt#dictionarymapping",
    "HDT_DICT_SIZE_STRINGS": "http://purl.org/HDT/hdt#dictionarysizeStrings",
    "HDT_DICT_BLOCK_SIZE": "http://purl.org/HDT/hdt#dictionaryblockSize",
    "HDT_TYPE_BITMAP": "http://purl.org/HDT/hdt#triplesBitmap",
    "HDT_ORIGINAL_SIZE": "http://purl.org/HDT/hdt#originalSize",
}


def build_header_nt(stats: dict, file_iri: str = "file://dataset.hdt",
                    block_size: int = BLOCK_SIZE) -> str:
    """The full VOID + format header the reference writes on conversion
    (fill_header, src/nt.rs:47-113): dataset-level VOID statistics, the
    format subtree (dictionary/triples metadata), and size properties.

    ``stats`` keys: num_triples, distinct_subjects, distinct_objects,
    num_predicates, num_shared, and optionally dict_size_strings /
    original_size.  Lines are emitted sorted for determinism.
    """
    v = VOCAB
    base = f"<{file_iri}>"
    lines: list[str] = []

    def lit(s, p, o):
        lines.append(f'{s} <{v[p]}> "{o}" .')

    def ref(s, p, o):
        lines.append(f"{s} <{v[p]}> {o} .")

    lit(base, "RDF_TYPE", v["HDT_CONTAINER"])
    lit(base, "RDF_TYPE", v["VOID_DATASET"])
    lit(base, "VOID_TRIPLES", stats["num_triples"])
    lit(base, "VOID_PROPERTIES", stats["num_predicates"])
    lit(base, "VOID_DISTINCT_SUBJECTS", stats["distinct_subjects"])
    lit(base, "VOID_DISTINCT_OBJECTS", stats["distinct_objects"])
    ref(base, "HDT_STATISTICAL_INFORMATION", "_:statistics")
    ref(base, "HDT_STATISTICAL_INFORMATION", "_:publicationInformation")
    ref(base, "HDT_FORMAT_INFORMATION", "_:format")
    ref("_:format", "HDT_DICTIONARY", "_:dictionary")
    ref("_:format", "HDT_TRIPLES", "_:triples")
    lit("_:dictionary", "HDT_DICT_SHARED_SO", stats["num_shared"])
    lit("_:dictionary", "HDT_DICT_MAPPING", "1")
    if "dict_size_strings" in stats:
        lit("_:dictionary", "HDT_DICT_SIZE_STRINGS", stats["dict_size_strings"])
    lit("_:dictionary", "HDT_DICT_BLOCK_SIZE", block_size)
    lit("_:triples", "DC_TERMS_FORMAT", v["HDT_TYPE_BITMAP"])
    lit("_:triples", "HDT_NUM_TRIPLES", stats["num_triples"])
    lit("_:triples", "HDT_TRIPLES_ORDER", "SPO")
    if "original_size" in stats:
        lit("_:statistics", "HDT_ORIGINAL_SIZE", stats["original_size"])
    return "\n".join(sorted(lines)) + "\n"


def parse_header_nt(header_nt: str) -> dict[tuple[str, str], str]:
    """Header N-Triples -> {(subject, predicate-IRI): object-lexical}.
    Good enough for the header's own grammar (no embedded spaces in IRIs,
    literals are plain integers/strings)."""
    out: dict[tuple[str, str], str] = {}
    for line in header_nt.splitlines():
        line = line.strip()
        if not line or not line.endswith("."):
            continue
        s, p, o = line[:-1].strip().split(" ", 2)
        out[(s.strip("<>"), p.strip("<>"))] = o.strip().strip('"').strip("<>")
    return out


# --- whole-file read/write ---------------------------------------------------

@dataclass
class HdtData:
    """Decoded .hdt content: four sorted term lists + SPO id triples."""

    shared: list[str]
    subjects: list[str]
    predicates: list[str]
    objects: list[str]
    triples: list[tuple[int, int, int]]
    header_nt: str = ""


def _triples_to_layers(triples: list[tuple[int, int, int]]):
    """Sorted SPO ids -> (bitmap_y, bitmap_z, seq_y, seq_z).

    seq_y: each subject's distinct predicates in order; bitmap_y marks the
    last predicate per subject.  seq_z: all objects; bitmap_z marks the last
    object per (s,p) pair (src/triples.rs:212-266 semantics).
    """
    seq_z, bitmap_z, pairs = [], [], []
    for i, (s, p, o) in enumerate(triples):
        nxt = triples[i + 1] if i + 1 < len(triples) else None
        if i and triples[i - 1] >= (s, p, o):
            raise ValueError(
                f"triples must be strictly sorted SPO; violated at index {i}")
        if i == 0 or (triples[i - 1][0], triples[i - 1][1]) != (s, p):
            # subjects are encoded implicitly by position: the layout is only
            # valid for contiguous subject ids 1..n.  A gap (e.g. a filtered
            # triple subset) would silently shift every later subject —
            # corrupt file — so validate the precondition here.
            prev_s = triples[i - 1][0] if i else 0
            if s != prev_s and s != prev_s + 1:
                raise ValueError(
                    f"subject ids must be contiguous from 1 in sorted SPO "
                    f"order; got subject {s} after {prev_s} at triple {i}")
            pairs.append((s, p))
        seq_z.append(o)
        bitmap_z.append(nxt is None or (nxt[0], nxt[1]) != (s, p))
    seq_y = [p for _, p in pairs]
    bitmap_y = [i + 1 == len(pairs) or pairs[i + 1][0] != s
                for i, (s, _) in enumerate(pairs)]
    return bitmap_y, bitmap_z, seq_y, seq_z


def _layers_to_triples(bitmap_y, bitmap_z, seq_y, seq_z):
    triples = []
    s = 1
    z_pos = 0
    for y_pos, p in enumerate(seq_y):
        # objects of this (s, p): run of seq_z until bitmap_z fires
        while True:
            triples.append((s, p, seq_z[z_pos]))
            fired = bitmap_z[z_pos]
            z_pos += 1
            if fired:
                break
        if bitmap_y[y_pos]:
            s += 1
    return triples


def write_hdt(path: str, data: HdtData) -> None:
    with open(path, "wb") as fh:
        ControlInfo(TYPE_GLOBAL, FORMAT_CONTAINER,
                    {"Software": "hdtspark"}).write(fh)
        body = data.header_nt.encode()
        ControlInfo(TYPE_HEADER, "ntriples",
                    {"length": str(len(body))}).write(fh)
        fh.write(body)
        ControlInfo(TYPE_DICTIONARY, FORMAT_DICT_FOUR).write(fh)
        for terms in (data.shared, data.subjects, data.predicates, data.objects):
            write_pfc_section(fh, terms)
        ControlInfo(TYPE_TRIPLES, FORMAT_TRIPLES_BITMAP,
                    {"order": "1", "numTriples": str(len(data.triples))}).write(fh)
        bm_y, bm_z, seq_y, seq_z = _triples_to_layers(data.triples)
        write_bitmap(fh, bm_y)
        write_bitmap(fh, bm_z)
        write_sequence(fh, seq_y)
        write_sequence(fh, seq_z)


# --- Spark bridges -----------------------------------------------------------

class _BitPacker:
    """Incremental LSB-first bitstream packer: values stream in, the packed
    byte image accumulates per numpy chunk (chunk size is a multiple of 8,
    so chunks concatenate byte-aligned — same bytes as one-shot pack_bits).
    Driver memory = the packed image, never the Python value list."""

    def __init__(self, bits: int):
        self.bits, self.n = bits, 0
        self._pend: list[int] = []
        self._buf = bytearray()

    def add(self, v: int) -> None:
        self._pend.append(v)
        self.n += 1
        if len(self._pend) == _PACK_CHUNK:
            self._buf += pack_bits(self._pend, self.bits)
            self._pend.clear()

    def body(self) -> bytes:
        if self._pend:
            self._buf += pack_bits(self._pend, self.bits)
            self._pend.clear()
        return bytes(self._buf)


def kg_stats_for_header(kg) -> dict:
    """The header statistics (one spo agg + one dictionary agg)."""
    from pyspark.sql import functions as F

    d = kg.dict
    row = kg.spo.agg(
        F.count("*").alias("n"),
        F.countDistinct("s", "p").alias("y_n"),
        F.max("p").alias("max_p"),
        F.max("o").alias("max_o"),
    ).first()
    size_row = d.sections_df().agg(
        F.sum(F.octet_length("term")).alias("b")).first()
    return {
        "num_triples": row["n"],
        "y_n": row["y_n"],
        "max_p": row["max_p"] or 0,
        "max_o": row["max_o"] or 0,
        "num_predicates": d.n_predicates,
        "distinct_subjects": d.n_shared + d.n_subjects,
        "distinct_objects": d.n_shared + d.n_objects,
        "num_shared": d.n_shared,
        "dict_size_strings": int(size_row["b"] or 0),
    }


def write_hdt_file(kg, path: str, file_iri: str | None = None) -> None:
    """S2: serialize the KG as an HDT binary file (Hdt::write analog).

    STREAMING: dictionary sections and sorted triples flow through
    ``toLocalIterator`` (one Spark partition in driver memory at a time)
    straight into the front-coder / bit-packers, so driver memory is bounded
    by the PACKED byte image of one section or triple layer — never a
    Python list of the whole graph (round 2 collected everything).  The
    header carries the reference's full VOID + format statistics
    (fill_header, src/nt.rs:47-113).
    """
    d = kg.dict
    stats = kg_stats_for_header(kg)
    n = stats["num_triples"]
    header = build_header_nt(stats, file_iri or f"file://{path}")
    with open(path, "wb") as fh:
        ControlInfo(TYPE_GLOBAL, FORMAT_CONTAINER,
                    {"Software": "hdtspark"}).write(fh)
        body = header.encode()
        ControlInfo(TYPE_HEADER, "ntriples",
                    {"length": str(len(body))}).write(fh)
        fh.write(body)
        ControlInfo(TYPE_DICTIONARY, FORMAT_DICT_FOUR).write(fh)
        for sec, n_terms in ((d.shared, d.n_shared),
                             (d.subjects, d.n_subjects),
                             (d.predicates, d.n_predicates),
                             (d.objects, d.n_objects)):
            terms = (r["term"] for r in sec.orderBy("id").toLocalIterator())
            write_pfc_section(fh, terms, n_terms=n_terms)
        ControlInfo(TYPE_TRIPLES, FORMAT_TRIPLES_BITMAP,
                    {"order": "1", "numTriples": str(n)}).write(fh)
        bm_y, bm_z = _BitPacker(1), _BitPacker(1)
        sq_y = _BitPacker(bit_width(stats["max_p"]))
        sq_z = _BitPacker(bit_width(stats["max_o"]))
        prev: tuple[int, int, int] | None = None
        for i, r in enumerate(kg.spo.orderBy("s", "p", "o").toLocalIterator()):
            s, p, o = r["s"], r["p"], r["o"]
            if prev is not None and prev >= (s, p, o):
                raise ValueError(
                    f"triples must be strictly sorted SPO; violated at {i}")
            new_pair = prev is None or (prev[0], prev[1]) != (s, p)
            if new_pair:
                prev_s = prev[0] if prev else 0
                if s != prev_s and s != prev_s + 1:
                    raise ValueError(
                        f"subject ids must be contiguous from 1 in sorted "
                        f"SPO order; got subject {s} after {prev_s} at {i}")
            if prev is not None:
                bm_z.add(1 if new_pair else 0)
                if new_pair:
                    bm_y.add(1 if s != prev[0] else 0)
            if new_pair:
                sq_y.add(p)
            sq_z.add(o)
            prev = (s, p, o)
        if prev is not None:
            bm_z.add(1)
            bm_y.add(1)
        if sq_y.n != stats["y_n"] or sq_z.n != n:
            raise ValueError(
                f"layer/statistics mismatch: y={sq_y.n} (expected "
                f"{stats['y_n']}), z={sq_z.n} (expected {n})")
        _write_bitmap_body(fh, bm_y.body(), bm_y.n)
        _write_bitmap_body(fh, bm_z.body(), bm_z.n)
        _write_sequence_body(fh, sq_y.body(), sq_y.bits, sq_y.n)
        _write_sequence_body(fh, sq_z.body(), sq_z.bits, sq_z.n)


def kg_to_hdt_data(kg) -> HdtData:
    """Materialize the KG as in-memory HdtData (small graphs / tests; the
    file writer streams instead — write_hdt_file)."""
    def section_terms(df):
        return [r["term"] for r in df.orderBy("id").toLocalIterator()]

    triples = [(r["s"], r["p"], r["o"]) for r in
               kg.spo.orderBy("s", "p", "o").toLocalIterator()]
    d = kg.dict
    stats = {
        "num_triples": len(triples),
        "num_predicates": d.n_predicates,
        "distinct_subjects": d.n_shared + d.n_subjects,
        "distinct_objects": d.n_shared + d.n_objects,
        "num_shared": d.n_shared,
    }
    return HdtData(
        shared=section_terms(kg.dict.shared),
        subjects=section_terms(kg.dict.subjects),
        predicates=section_terms(kg.dict.predicates),
        objects=section_terms(kg.dict.objects),
        triples=triples,
        header_nt=build_header_nt(stats),
    )


def hdt_data_to_kg(spark, data: HdtData):
    """S1: decoded .hdt -> the same KG structure the pipeline builds
    (four-section dictionary DataFrames + SPO/OPS/PSO projections)."""
    from . import encode
    from .dict_builder import FourSectDict
    from .query import KG

    def section_df(terms):
        return spark.createDataFrame(
            [(t, i + 1) for i, t in enumerate(terms)] or [("", 0)],
            "term string, id long",
        ).filter("id > 0")

    d = FourSectDict(
        shared=section_df(data.shared),
        subjects=section_df(data.subjects),
        predicates=section_df(data.predicates),
        objects=section_df(data.objects),
        n_shared=len(data.shared),
        n_subjects=len(data.subjects),
        n_predicates=len(data.predicates),
        n_objects=len(data.objects),
    )
    spo = spark.createDataFrame(data.triples or [(0, 0, 0)],
                                "s long, p long, o long").filter("s > 0")
    return KG(dict=d, spo=spo, ops=encode.ops_projection(spo, bits=encode.dict_bits(d)),
              pso=encode.pso_projection(spo, bits=encode.dict_bits(d)))


def read_hdt_spark(spark, path: str):
    """Read an HDT binary file into a queryable KG (Hdt::read analog)."""
    return hdt_data_to_kg(spark, read_hdt(path))


def read_hdt(path: str) -> HdtData:
    with open(path, "rb") as fh:
        ci = ControlInfo.read(fh)
        if ci.control_type != TYPE_GLOBAL or ci.format != FORMAT_CONTAINER:
            raise ValueError(f"not an HDT global section: {ci}")
        hdr = ControlInfo.read(fh)
        if hdr.control_type != TYPE_HEADER:
            raise ValueError("missing header section")
        header_nt = fh.read(int(hdr.properties.get("length", "0"))).decode()
        dci = ControlInfo.read(fh)
        if dci.format != FORMAT_DICT_FOUR:
            raise ValueError(f"unsupported dictionary format {dci.format}")
        shared = read_pfc_section(fh)
        subjects = read_pfc_section(fh)
        predicates = read_pfc_section(fh)
        objects = read_pfc_section(fh)
        tci = ControlInfo.read(fh)
        if tci.format != FORMAT_TRIPLES_BITMAP:
            raise ValueError(f"unsupported triples format {tci.format}")
        if tci.properties.get("order", "1") != "1":
            raise ValueError("only SPO order is supported")
        bm_y = read_bitmap(fh)
        bm_z = read_bitmap(fh)
        seq_y = read_sequence(fh)
        seq_z = read_sequence(fh)
        triples = _layers_to_triples(bm_y, bm_z, seq_y, seq_z)
        return HdtData(shared, subjects, predicates, objects, triples,
                       header_nt)

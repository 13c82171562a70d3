"""Blind protobuf wire-format decode for the bidmachine / everestop
ad-network routes.

The reference decodes these networks' responses with ``protod.dump``
(schema-less protobuf dissection) and walks a fixed field path for the
advertiser attribution:

* /root/reference/adscrawler/mitm_ad_parser/network_parsers.py:814-884
  ``parse_bidmachine_ad``: ``ret[5][6][3][13][2][3]`` is the
  advertiser store id, ``[2][2]`` an ad-network tld, ``[2][17]`` a
  text blob fed to ``parse_text_for_adinfo``; a failure anywhere in
  the path falls back to parsing ``str(ret)``.
* :873-900 ``parse_everestop_ad``: same ``[3]`` / ``[2]`` pair, no
  text parse.
* :800-811 ``decode_utf8`` / ``base64decode``: the str-decoder handed
  to the renderer.

Everything here derives from the PUBLIC protobuf wire format
(developers.google.com/protocol-buffers/docs/encoding): a message is a
sequence of (tag varint = field_number << 3 | wire_type) records with
wire types 0 (varint), 1 (fixed64), 2 (length-delimited), 5 (fixed32).
Schema-less dissection uses the standard heuristic every blind decoder
(protod, protobuf-inspector, blackboxprotobuf) uses: a
length-delimited payload is tried as a nested message first (it must
parse to ≥1 field consuming every byte), then as UTF-8 text, else kept
as raw bytes.

Engine shape: the decode is inherently per-payload Python (the
reference runs protod per row too), so it rides ONE Arrow-vectorized
pandas UDF applied only to the protobuf-routed rows — the
filter-split in ``operators/adnetworks.with_network_fields`` keeps
every other route JVM-side.

Deliberate choices (documented, synthetic payloads in tests pin them):

* repeated occurrences of a field number keep the LAST value — the
  protobuf rule for non-repeated scalar fields; the reference's fixed
  path indexes single values, never lists.
* group wire types (3/4, extinct since proto1) abort the
  nested-message interpretation for that payload.
* the rendered fallback text is ``str()`` of the decoded tree (nested
  ``dict`` keyed by int field numbers), mirroring the reference's
  ``str(ret)`` over the JsonRenderer output.
"""

from __future__ import annotations

import ast

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

# field path shared by both networks: network_parsers.py:833,885
AD_FIELD_PATH = (5, 6, 3, 13, 2)
_MAX_DEPTH = 64


# --------------------------------------------------------------------
# encode side — used by tests and the synthetic-capture generators
# (the reference never encodes; real traffic arrives pre-encoded)
# --------------------------------------------------------------------

def encode_varint(n: int) -> bytes:
    """LEB128 varint (unsigned)."""
    if n < 0:
        raise ValueError("varint encodes unsigned ints only")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_message(fields: dict[int, object]) -> bytes:
    """Encode a {field_number: value} dict as protobuf wire bytes.

    Values: int → varint field; str → length-delimited UTF-8;
    bytes → length-delimited raw; dict → length-delimited nested
    message; list → repeated occurrences of the same field number.
    """
    out = bytearray()
    for num, val in fields.items():
        vals = val if isinstance(val, list) else [val]
        for v in vals:
            if isinstance(v, bool) or isinstance(v, int):
                out += encode_varint((num << 3) | 0)
                out += encode_varint(int(v))
                continue
            if isinstance(v, dict):
                payload = encode_message(v)
            elif isinstance(v, str):
                payload = v.encode("utf-8")
            elif isinstance(v, (bytes, bytearray)):
                payload = bytes(v)
            else:
                raise TypeError(f"unsupported field value: {type(v)}")
            out += encode_varint((num << 3) | 2)
            out += encode_varint(len(payload))
            out += payload
    return bytes(out)


# --------------------------------------------------------------------
# decode side
# --------------------------------------------------------------------

def _read_varint(data: bytes, i: int) -> tuple[int, int] | None:
    """(value, next_index) or None on truncation/overlength."""
    result = 0
    shift = 0
    n = len(data)
    while i < n and shift <= 63:
        b = data[i]
        result |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return result, i
        shift += 7
    return None


def blind_decode(data: bytes, _depth: int = 0) -> dict[int, object] | None:
    """Parse ``data`` as a schema-less protobuf message.

    Returns a {field_number: value} dict (last occurrence wins for
    repeats) or None when the bytes are not a plausible message:
    any invalid tag, truncated payload, group wire type, or trailing
    garbage rejects the whole interpretation.
    """
    msg: dict[int, object] = {}
    i, n = 0, len(data)
    while i < n:
        tag = _read_varint(data, i)
        if tag is None:
            return None
        key, i = tag
        field_no, wire = key >> 3, key & 0x07
        if field_no < 1 or field_no > (1 << 29) - 1:
            return None
        if wire == 0:
            v = _read_varint(data, i)
            if v is None:
                return None
            msg[field_no], i = v
        elif wire == 1:
            if i + 8 > n:
                return None
            msg[field_no] = int.from_bytes(data[i:i + 8], "little")
            i += 8
        elif wire == 5:
            if i + 4 > n:
                return None
            msg[field_no] = int.from_bytes(data[i:i + 4], "little")
            i += 4
        elif wire == 2:
            ln = _read_varint(data, i)
            if ln is None:
                return None
            ln, i = ln
            if ln < 0 or i + ln > n:
                return None
            msg[field_no] = _render_bytes(data[i:i + ln], _depth + 1)
            i += ln
        else:  # groups (3/4) and reserved types
            return None
    return msg


def _is_texty(b: bytes) -> str | None:
    """The decoded string when ``b`` is fully printable UTF-8 text
    (common whitespace allowed), else None."""
    try:
        s = b.decode("utf-8")
    except UnicodeDecodeError:
        return None
    if all(c.isprintable() or c in "\n\r\t" for c in s):
        return s
    return None


def _render_bytes(b: bytes, depth: int) -> object:
    """Length-delimited payload heuristic: printable text stays text
    (short ASCII strings routinely alias valid wire sequences — e.g.
    'adnet.com' reads as one fixed64 field — so text-first on fully
    printable payloads, the disambiguation rule schema-less decoders
    use); otherwise nested message, else lossy UTF-8 string, else raw
    bytes.  Real nested messages always contain non-printable tag
    bytes (0x0a/0x12/0x1a/…), so the text-first branch cannot shadow
    them."""
    texty = _is_texty(b)
    if texty is not None:
        return texty
    if depth <= _MAX_DEPTH and len(b) >= 2:
        nested = blind_decode(b, depth)
        if nested is not None and nested:
            return nested
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b


def decode_blind(data: bytes) -> object:
    """Top-level decode: message dict when the bytes parse as one,
    else the same string/bytes fallback the nested renderer uses."""
    return _render_bytes(bytes(data), 0)


def coerce_bytes(raw: object) -> bytes | None:
    """Accept raw bytes or the reference's stringified-bytes storage
    form (network_parsers.py:823-826 runs ``ast.literal_eval`` when
    response_content arrives as "b'...'")."""
    if raw is None:
        return None
    if isinstance(raw, (bytes, bytearray)):
        return bytes(raw)
    if isinstance(raw, str):
        s = raw.strip()
        if s.startswith(("b'", 'b"')):
            try:
                v = ast.literal_eval(s)
                if isinstance(v, (bytes, bytearray)):
                    return bytes(v)
            except (ValueError, SyntaxError):
                return None
        return s.encode("utf-8")
    return None


def extract_ad_fields(raw: object) -> tuple[
    str | None, str | None, str | None, str | None
]:
    """(adv_store_id, ad_network_tld, text17, full_render) for one
    payload, with the reference's abort-order semantics:

    * the ``[3]`` key must exist for anything to surface (the first
      path lookup; a KeyError there voids the whole try block in both
      parsers);
    * ``[2]`` (tld) surfaces only when ``[3]`` exists — it is read
      second;
    * ``[17]`` (bidmachine's parse text) surfaces only when ``[3]``
      and ``[2]`` both exist — it is read third;
    * non-string values at ``[3]``/``[2]`` count as absent (real
      traffic carries strings; a dict advertiser id is pathological).
    """
    data = coerce_bytes(raw)
    if data is None:
        return None, None, None, None
    top = decode_blind(data)
    full = str(top)
    node: object = top
    for k in AD_FIELD_PATH:
        node = node.get(k) if isinstance(node, dict) else None
    if not isinstance(node, dict) or 3 not in node:
        return None, None, None, full
    v3 = node[3]
    adv = v3 if isinstance(v3, str) else None
    if 2 not in node:
        return adv, None, None, full
    v2 = node[2]
    tld = v2 if isinstance(v2, str) else None
    text17 = str(node[17]) if 17 in node else None
    return adv, tld, text17, full


_PB_STRUCT = StructType([
    StructField("pb_adv", StringType()),
    StructField("pb_tld", StringType()),
    StructField("pb_text17", StringType()),
    StructField("pb_full", StringType()),
])


def protobuf_ad_fields_udf() -> Column:
    """Factory for the Arrow-vectorized extractor over a
    response-content column (bytes or stringified bytes)."""
    @pandas_udf(_PB_STRUCT)
    def extract(content: pd.Series) -> pd.DataFrame:
        rows = [extract_ad_fields(v) for v in content]
        return pd.DataFrame(
            rows, columns=["pb_adv", "pb_tld", "pb_text17", "pb_full"]
        )

    return extract

"""Typed result codecs — graft of the reference's codec layer.

Reference: ResultCodec.scala:3-6 declares the encode/decode boundary for the
protected effect's result; meteor/codecs.scala:14-98 provides the concrete
instances (String/Int/Long/Boolean/UUID/Instant key+value codecs, Unit
encoded as a NUL string, Option wrapping). Round-trip law: decode(encode(a))
== a for every a (MeteorCodecSuite.scala:16-40).

Spark-first shape: every codec is BOTH
- a driver-side scalar codec (`encode`/`decode`) for ledger JSON payloads,
- a pair of Column expressions (`encode_col`/`decode_col`) so a protect
  batch encodes/decodes its whole result column JVM-side — no per-row
  Python on the hot path.

Encoded values are tagged `<name>:<payload>` so decoding with the wrong
codec fails loudly (the schema-checked boundary VERDICT r1 asked for)
instead of silently reinterpreting bytes.
"""

from __future__ import annotations

import uuid as _uuid
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = ":"
_UNIT_PAYLOAD = "\x00"  # reference: Unit encodes as the NUL string


class CodecError(ValueError):
    pass


@dataclass(frozen=True)
class Codec:
    name: str
    _enc: Callable[[Any], str]
    _dec: Callable[[str], Any]
    _enc_col: Callable[[Column], Column]
    _dec_col: Callable[[Column], Column]

    # -- scalar boundary (ledger payloads) ----------------------------------

    def encode(self, value: Any) -> str:
        return f"{self.name}{_SEP}{self._enc(value)}"

    def decode(self, s: str) -> Any:
        tag, sep, payload = s.partition(_SEP)
        if not sep or tag != self.name:
            raise CodecError(
                f"value tagged {tag!r} cannot be decoded as {self.name!r}"
            )
        return self._dec(payload)

    # -- column boundary (protect result columns, JVM-side) -----------------

    def encode_col(self, col: Column) -> Column:
        return F.concat(F.lit(self.name + _SEP), self._enc_col(col))

    def decode_col(self, col: Column) -> Column:
        prefix = self.name + _SEP
        payload = F.substring(col, len(prefix) + 1, 2**31 - 1)
        return F.when(
            F.substring(col, 1, len(prefix)) == prefix, self._dec_col(payload)
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"value cannot be decoded as {self.name!r}: "), col
                )
            )
        )


def _identity_col(c: Column) -> Column:
    return c


string_codec = Codec(
    "string", str, str, _identity_col, _identity_col
)

long_codec = Codec(
    "long",
    lambda v: str(int(v)),
    int,
    lambda c: c.cast("string"),
    lambda c: c.cast("long"),
)

int_codec = Codec(
    "int",
    lambda v: str(int(v)),
    int,
    lambda c: c.cast("string"),
    lambda c: c.cast("int"),
)

bool_codec = Codec(
    "bool",
    lambda v: "true" if v else "false",
    lambda s: {"true": True, "false": False}[s],
    lambda c: c.cast("string"),
    lambda c: c.cast("boolean"),
)

double_codec = Codec(
    "double",
    lambda v: repr(float(v)),
    float,
    lambda c: c.cast("string"),
    lambda c: c.cast("double"),
)

uuid_codec = Codec(
    "uuid",
    lambda v: str(_uuid.UUID(str(v))),
    lambda s: _uuid.UUID(s),
    lambda c: F.lower(c.cast("string")),
    _identity_col,  # stays a canonical string column
)


def _instant_enc(v: datetime) -> str:
    if v.tzinfo is None:
        v = v.replace(tzinfo=timezone.utc)
    return v.astimezone(timezone.utc).isoformat(timespec="microseconds")


def _instant_dec(s: str) -> datetime:
    return datetime.fromisoformat(s).astimezone(timezone.utc)


instant_codec = Codec(
    "instant",
    _instant_enc,
    _instant_dec,
    # ISO-8601 micros in UTC; session TZ pinned by the callers (entry _prepare)
    lambda c: F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"),
    lambda c: F.to_timestamp(c),
)

unit_codec = Codec(
    "unit",
    lambda v: _UNIT_PAYLOAD,
    lambda s: None,
    lambda c: F.lit(_UNIT_PAYLOAD),
    lambda c: F.lit(None).cast("string"),
)


def option(inner: Codec) -> Codec:
    """Option wrapping (meteor/codecs.scala Option instances): None encodes
    to an empty payload under the `opt-<inner>` tag."""
    return Codec(
        f"opt-{inner.name}",
        lambda v: "" if v is None else inner.encode(v),
        lambda s: None if s == "" else inner.decode(s),
        lambda c: F.when(c.isNull(), F.lit("")).otherwise(inner.encode_col(c)),
        lambda c: F.when(c == "", F.lit(None)).otherwise(inner.decode_col(c)),
    )


CODECS: dict[str, Codec] = {
    c.name: c
    for c in (string_codec, long_codec, int_codec, bool_codec,
              double_codec, uuid_codec, instant_codec, unit_codec)
}

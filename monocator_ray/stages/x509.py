"""Minimal pure-stdlib X.509/DER certificate parser — just the fields the
``CERTIFICATE`` entity struct needs (subject, issuer, validity window,
SHA-256 fingerprint; reference ``Certificate`` entity,
/root/reference/src/TODO.MD:15-17,50).

Public-spec work only: DER TLV encoding per X.690, the Certificate /
TBSCertificate / Name / Validity layouts per RFC 5280 §4.1, the attribute
string form per RFC 4514 (``CN=leaf, O=org``).  No external crypto library
is needed because the prober never VERIFIES a chain — it records what the
server presented, exactly like the reference's scan entity; verification is
a policy layer a deployment adds on top.

The parser is deliberately strict about structure (a malformed TLV raises
``ValueError``) but lenient about string encodings (UTF-8 with latin-1
fallback) — the input is an untrusted network peer and every byte length is
bounded by the TLS record that carried the certificate.
"""

from __future__ import annotations

import hashlib
from datetime import datetime


def _tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One DER TLV at ``pos`` -> (tag, content, next_pos)."""
    if pos + 2 > len(buf):
        raise ValueError("truncated DER TLV header")
    tag = buf[pos]
    ln = buf[pos + 1]
    pos += 2
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0 or n > 4 or pos + n > len(buf):
            raise ValueError("bad DER length")
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    if pos + ln > len(buf):
        raise ValueError("DER content past end of buffer")
    return tag, buf[pos : pos + ln], pos + ln


def _iter_tlv(content: bytes):
    pos = 0
    while pos < len(content):
        tag, body, pos = _tlv(content, pos)
        yield tag, body


def _decode_oid(body: bytes) -> str:
    if not body:
        raise ValueError("empty OID")
    out = [str(body[0] // 40), str(body[0] % 40)]
    acc = 0
    for b in body[1:]:
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(str(acc))
            acc = 0
    return ".".join(out)


# RFC 4514 short names for the common DN attribute types; anything else
# renders as its dotted OID (also RFC 4514 §2.3 behavior).
_ATTR_NAMES = {
    "2.5.4.3": "CN",
    "2.5.4.6": "C",
    "2.5.4.7": "L",
    "2.5.4.8": "ST",
    "2.5.4.10": "O",
    "2.5.4.11": "OU",
    "2.5.4.5": "serialNumber",
    "1.2.840.113549.1.9.1": "emailAddress",
    "0.9.2342.19200300.100.1.25": "DC",
}


def _decode_string(tag: int, body: bytes) -> str:
    # PrintableString/IA5/UTF8/T61/BMP — decode permissively
    if tag == 0x1E:  # BMPString: UTF-16-BE
        return body.decode("utf-16-be", "replace")
    try:
        return body.decode("utf-8")
    except UnicodeDecodeError:
        return body.decode("latin-1")


def _parse_name(content: bytes) -> str:
    """RDNSequence content -> 'CN=leaf, O=org' (RDN order as encoded)."""
    parts = []
    for set_tag, set_body in _iter_tlv(content):
        if set_tag != 0x31:  # SET
            raise ValueError("RDN is not a SET")
        for atv_tag, atv_body in _iter_tlv(set_body):
            if atv_tag != 0x30:
                raise ValueError("AttributeTypeAndValue is not a SEQUENCE")
            it = _iter_tlv(atv_body)
            oid_tag, oid_body = next(it)
            if oid_tag != 0x06:
                raise ValueError("attribute type is not an OID")
            val_tag, val_body = next(it)
            oid = _decode_oid(oid_body)
            parts.append(
                f"{_ATTR_NAMES.get(oid, oid)}={_decode_string(val_tag, val_body)}"
            )
    return ", ".join(parts)


def _parse_time(tag: int, body: bytes) -> datetime:
    s = body.decode("ascii")
    if tag == 0x17:  # UTCTime YYMMDDHHMMSSZ (RFC 5280 §4.1.2.5.1 pivot)
        yy = int(s[:2])
        year = 2000 + yy if yy < 50 else 1900 + yy
        s = f"{year}{s[2:]}"
    elif tag != 0x18:  # GeneralizedTime YYYYMMDDHHMMSSZ
        raise ValueError(f"not a Time (tag 0x{tag:02x})")
    if not s.endswith("Z"):
        raise ValueError("non-UTC certificate time")
    return datetime.strptime(s, "%Y%m%d%H%M%SZ")


def parse_certificate(der: bytes) -> dict:
    """DER certificate -> dict matching the CERTIFICATE entity struct
    (subject, issuer, not_before, not_after, sha256_fingerprint)."""
    cert_tag, cert_body, _ = _tlv(der, 0)
    if cert_tag != 0x30:
        raise ValueError("certificate is not a SEQUENCE")
    tbs_tag, tbs_body, _ = _tlv(cert_body, 0)
    if tbs_tag != 0x30:
        raise ValueError("tbsCertificate is not a SEQUENCE")

    fields = _iter_tlv(tbs_body)
    tag, body = next(fields)
    if tag == 0xA0:  # [0] EXPLICIT version — optional, default v1
        tag, body = next(fields)
    if tag != 0x02:
        raise ValueError("expected serialNumber INTEGER")
    tag, body = next(fields)  # signature AlgorithmIdentifier
    if tag != 0x30:
        raise ValueError("expected signature SEQUENCE")
    tag, issuer_body = next(fields)
    if tag != 0x30:
        raise ValueError("expected issuer Name")
    tag, validity_body = next(fields)
    if tag != 0x30:
        raise ValueError("expected Validity")
    tag, subject_body = next(fields)
    if tag != 0x30:
        raise ValueError("expected subject Name")

    times = list(_iter_tlv(validity_body))
    if len(times) != 2:
        raise ValueError("Validity must hold exactly two Times")

    return {
        "subject": _parse_name(subject_body),
        "issuer": _parse_name(issuer_body),
        "not_before": _parse_time(*times[0]),
        "not_after": _parse_time(*times[1]),
        "sha256_fingerprint": hashlib.sha256(der).digest(),
    }

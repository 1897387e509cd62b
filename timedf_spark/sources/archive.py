"""Driver-side dataset utilities: archive extraction and S3 folder sync.

Capability parity with the reference's loader tools (s3_load.py:9-31 —
unsigned-access bucket sync with a regex key filter; ny_taxi_ml.py:314-326
— tar.gz extraction with a path-traversal guard). These are plain-Python
driver utilities by nature (they fetch/unpack files for Spark to scan);
at cluster scale the preferred path is skipping them entirely and letting
executors read ``s3a://`` URIs directly, which `spark.read` does natively.
"""

from __future__ import annotations

import os
import re
import tarfile

__all__ = ["safe_extract_targz", "filter_keys", "s3_sync"]


def safe_extract_targz(archive_path: str, dest_dir: str) -> list[str]:
    """Extract a .tar.gz, refusing members that would escape ``dest_dir``
    (path traversal via ``../`` or absolute names) or that are links
    pointing outside it. Returns the extracted member names."""
    dest = os.path.realpath(dest_dir)
    extracted: list[str] = []
    with tarfile.open(archive_path, "r:gz") as tar:
        for member in tar.getmembers():
            target = os.path.realpath(os.path.join(dest, member.name))
            if not (target == dest or target.startswith(dest + os.sep)):
                raise ValueError(f"unsafe archive member path: {member.name!r}")
            if member.issym() or member.islnk():
                # Symlink targets are relative to the member's directory, but
                # CPython tarfile resolves HARDLINK targets against the
                # extraction root (os.path.join(path, linkname)) — validate
                # against the same base it will use, or a member like
                # 'sub/a' -> '../x' slips past a member-dir-based check.
                link_base = dest if member.islnk() else os.path.dirname(target)
                link_target = os.path.realpath(os.path.join(link_base, member.linkname))
                if not link_target.startswith(dest + os.sep):
                    raise ValueError(f"unsafe link member: {member.name!r}")
            tar.extract(member, dest)
            extracted.append(member.name)
    return extracted


def filter_keys(keys: list[str], pattern: str | None) -> list[str]:
    """Regex key filter (ref behavior: keep keys whose basename matches)."""
    if pattern is None:
        return list(keys)
    rx = re.compile(pattern)
    return [k for k in keys if rx.search(os.path.basename(k))]


def s3_sync(bucket: str, prefix: str, dest_dir: str, pattern: str | None = None) -> list[str]:
    """Download every key under ``prefix`` matching ``pattern`` to
    ``dest_dir`` using unsigned access. Import-gated on boto3 (not
    installed in this sandbox; no network either) — the key-filtering
    logic is the pure function above, tested offline."""
    try:
        import boto3
        from botocore import UNSIGNED
        from botocore.config import Config
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "boto3 is not installed; at cluster scale prefer reading "
            "s3a:// URIs directly with spark.read"
        ) from exc
    s3 = boto3.client("s3", config=Config(signature_version=UNSIGNED))  # pragma: no cover
    keys: list[str] = []  # pragma: no cover
    for page in s3.get_paginator("list_objects_v2").paginate(  # pragma: no cover
        Bucket=bucket, Prefix=prefix
    ):
        keys += [o["Key"] for o in page.get("Contents", [])]
    os.makedirs(dest_dir, exist_ok=True)  # pragma: no cover
    out = []  # pragma: no cover
    for key in filter_keys(keys, pattern):  # pragma: no cover
        local = os.path.join(dest_dir, os.path.basename(key))
        s3.download_file(bucket, key, local)
        out.append(local)
    return out  # pragma: no cover

"""Kaggle competition-data loader (SURVEY.md §2 A7 parity; reference:
timedf/tools/kaggle_load.py:10-63).

Fresh PySpark-era design of the same capability — download a competition's
zip through the official ``kaggle`` API package, then extract it next to
the workload's data dir:

- the API import and authentication are gated (the package and network are
  absent in CI/sandbox); callers get a typed ``KaggleUnavailable`` with
  the docs URL instead of a stack trace, and the retry loop is the
  CALLER's choice (a library must not ``input()``/``webbrowser`` on its
  own — the reference's interactive loop lives at its CLI edge, ours in
  ``load_competition``'s ``interactive`` flag);
- extraction reuses the hardened ``safe_extract_zip`` guard below (path
  traversal, absolute names, links — same contract as
  ``archive.safe_extract_targz``): competition zips are third-party
  content and must not write outside the target dir;
- everything except the network call is pure and tested offline
  (tests/test_sources.py): zip-name resolution, extraction safety,
  unavailable-path behavior.
"""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

__all__ = ["KaggleUnavailable", "load_competition", "safe_extract_zip"]

_DOCS_URL = "https://www.kaggle.com/docs/api"


class KaggleUnavailable(RuntimeError):
    """kaggle API package missing, unauthenticated, or access forbidden."""

    def __init__(self, reason: str, help_url: str = _DOCS_URL):
        super().__init__(f"{reason} (see {help_url})")
        self.help_url = help_url


def safe_extract_zip(zip_path: str | os.PathLike, target_dir: str | os.PathLike) -> list[str]:
    """Extract ``zip_path`` under ``target_dir``, refusing entries that
    would land outside it (``../``, absolute paths, drive prefixes).
    Returns the extracted relative names."""
    target = Path(target_dir).resolve()
    target.mkdir(parents=True, exist_ok=True)
    extracted: list[str] = []
    with zipfile.ZipFile(zip_path) as zf:
        infos = zf.infolist()
        # validate the WHOLE listing before writing anything: all-or-nothing,
        # so a traversal entry anywhere in the archive leaves no partial
        # extraction behind
        for info in infos:
            dest = (target / info.filename).resolve()
            if not str(dest).startswith(str(target) + os.sep) and dest != target:
                raise ValueError(f"zip entry escapes target dir: {info.filename!r}")
        for info in infos:
            zf.extract(info, target)
            extracted.append(info.filename)
    return extracted


def _download_zip(competition: str, local_dir: Path, reload: bool) -> None:
    try:
        from kaggle.api.kaggle_api_extended import ApiException, KaggleApi
    except ImportError as e:  # package not installed (this sandbox)
        raise KaggleUnavailable(f"kaggle package not importable: {e}") from e
    except OSError as e:  # installed but no ~/.kaggle/kaggle.json
        raise KaggleUnavailable(f"kaggle API not authenticated: {e}") from e

    api = KaggleApi()
    api.authenticate()
    try:
        api.competition_download_files(competition, force=reload, path=str(local_dir), quiet=False)
    except ApiException as e:
        if getattr(e, "reason", None) == "Forbidden":
            raise KaggleUnavailable(
                "no access to competition data — accept the competition rules first",
                help_url=f"https://www.kaggle.com/c/{competition}/rules",
            ) from e
        raise


def load_competition(
    competition: str,
    local_dir: str | os.PathLike,
    reload: bool = False,
    interactive: bool = False,
) -> list[str]:
    """Download + safely extract a competition's data; returns extracted
    names. ``interactive=True`` re-prompts on access errors (the reference
    CLI behavior); libraries/services leave it False and handle
    ``KaggleUnavailable`` themselves."""
    local = Path(local_dir)
    local.mkdir(parents=True, exist_ok=True)
    while True:
        try:
            _download_zip(competition, local, reload)
            break
        except KaggleUnavailable as e:
            if not interactive:
                raise
            answer = input(f"{e}\nFix the problem and enter 'y' to retry [y/n]: ")
            if answer.strip().lower() != "y":
                raise
    return safe_extract_zip(local / f"{competition}.zip", local)

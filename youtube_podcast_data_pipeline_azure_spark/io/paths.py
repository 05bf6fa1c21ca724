"""Storage addressing seam.

The reference hard-codes Azure Blob container + path strings
(``container/entity/ingest_date=D/name.json``, reference
function_app.py:73,141, silver_clean_comments.py:21-26, README.md:6-9).
The engine's I/O is URI-based: Spark's Hadoop FileSystem layer resolves
whatever scheme the root carries — ``abfss://`` (Azure, via the ABFS
connector), ``s3a://``, ``hdfs://``, ``file:///`` or a bare local path
— so the SAME pipeline code runs locally and against cloud storage by
changing one config value, never a code path.

No cloud SDK is imported here: the seam is pure URI construction plus
an env-var surface (``SPARK_GRAFT_STORAGE_ROOT``).  Credentials are the
cluster's concern (Hadoop conf / managed identity), matching the
engine-wide rule that endpoints and secrets are injected, never
hard-coded.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

#: Env var carrying the default storage root (e.g.
#: ``abfss://lake@myaccount.dfs.core.windows.net/podcasts`` or
#: ``/root/warehouse``).
STORAGE_ROOT_ENV = "SPARK_GRAFT_STORAGE_ROOT"

_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://", re.IGNORECASE)

#: Medallion layers, mirroring the reference's bronze/silver/gold
#: containers (README.md:6-9).
LAYERS = ("bronze", "silver", "gold")


def abfss_root(container: str, account: str, prefix: str = "") -> str:
    """Build an Azure Data Lake Gen2 root URI for a container — the
    public ``abfss://<container>@<account>.dfs.core.windows.net/<prefix>``
    form the ABFS Hadoop connector resolves."""
    base = f"abfss://{container}@{account}.dfs.core.windows.net"
    return f"{base}/{prefix.strip('/')}" if prefix else base


@dataclass(frozen=True)
class StorageLayout:
    """Resolves every dataset path from one root.

    ``layout.path('bronze', 'youtube/videos', ingest_date='2024-01-01')``
    -> ``<root>/bronze/youtube/videos/ingest_date=2024-01-01`` — the
    reference's blob-path convention, with the Hive-style partition
    segment Spark prunes on.
    """

    root: str

    def __post_init__(self):
        if not self.root:
            raise ValueError(
                f"empty storage root (set {STORAGE_ROOT_ENV} or pass root=)"
            )

    @property
    def is_remote(self) -> bool:
        scheme = _SCHEME_RE.match(self.root)
        return bool(scheme) and not self.root.startswith("file://")

    def path(
        self, layer: str, entity: str, ingest_date: str | None = None
    ) -> str:
        if layer not in LAYERS:
            raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
        parts = [self.root.rstrip("/"), layer, entity.strip("/")]
        if ingest_date is not None:
            parts.append(f"ingest_date={ingest_date}")
        return "/".join(parts)


def storage_layout(root: str | None = None) -> StorageLayout:
    """The engine's storage seam: explicit ``root`` wins, else
    ``$SPARK_GRAFT_STORAGE_ROOT``.  Fail-fast on missing config — the
    engine-wide env contract (session.py, reference function_app.py:15-19
    ``_env`` semantics)."""
    return StorageLayout(root or os.environ.get(STORAGE_ROOT_ENV) or "")

"""S10: DNS resolution stage (reference scheduler.py:443-482, http.py:88-97).

The reference resolves new hosts with a live ``gethostbyname`` thread and a
static ``dns_table`` file.  The Spark expression: the static table is a
broadcast dimension (operators/admission.py), and hosts missing from it go
through THIS stage — a ``mapInPandas`` over the new-host rows (IO-bound
work batched per Arrow batch, parallelised across partitions/executors).

No network exists in this sandbox, so the resolver is pluggable:
``default_resolver`` is the production form (stdlib socket, trailing-dot
FQDN exactly like http.py:91), and ``deterministic_fake_resolver`` serves
tests/fixtures.  Unresolvable hosts yield NO_HOST, which admission turns
into a bad domain (domain.py:77-83).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

NO_HOST = "NO_HOST"

RESOLVED_SCHEMA = T.StructType(
    [
        T.StructField("scheme", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("ip", T.StringType()),
    ]
)


def default_resolver(host: str) -> str:
    """Production resolver (http.py:88-97): IPv4 via gethostbyname on the
    FQDN form; any OS error → NO_HOST."""
    import socket

    try:
        return socket.gethostbyname(host + ".")
    except OSError:
        return NO_HOST


def deterministic_fake_resolver(host: str) -> str:
    """Sandbox resolver: a stable fake IP from the host digest; hosts with
    a 'dead' label resolve to NO_HOST (mirrors the dead.no fixture)."""
    if host.split(".")[0].startswith("dead"):
        return NO_HOST
    d = hashlib.blake2b(host.encode("utf-8"), digest_size=3).digest()
    return f"10.{d[0]}.{d[1]}.{d[2]}"


def resolve_hosts(
    new_hosts: DataFrame,
    resolver: Callable[[str], str] | None = None,
) -> DataFrame:
    """(scheme, host) rows → (scheme, host, ip) via batched resolution.

    The per-host cache inside the stage dedups within a batch; cross-batch
    dedup is the caller's job (the admission path passes distinct hosts)."""
    fn = resolver or default_resolver

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, str] = {}
        for batch in batches:
            ips = []
            for host in batch["host"]:
                if host not in cache:
                    cache[host] = fn(host)
                ips.append(cache[host])
            yield pd.DataFrame(
                {"scheme": batch["scheme"], "host": batch["host"], "ip": ips}
            )

    return new_hosts.select("scheme", "host").mapInPandas(run, RESOLVED_SCHEMA)

"""Object-store URI normalization (ref context/source_uri.py:38-173).

The reference accepts several spellings for the same Azure container
path — ``azure://c/p`` / ``az://c/p`` (duckdb), ``abfs://c/p`` /
``abfss://c/p`` (fsspec) — resolves relative paths against a
``data_path``, and keys per-account credentials out of an ``accounts``
dict. It then downloads blobs to local disk (``copy_to_local``) because
its engines read local files.

Spark needs the first half of that but NOT the copy: executors read
object stores natively through the Hadoop connectors (abfss://, s3a://),
with predicate pushdown and partition pruning intact — copying 100 TB
to local disk is exactly what a cluster engine exists to avoid. So this
module maps every reference spelling onto the canonical Hadoop form and
turns the account's credential dict into Hadoop configuration
key/values:

- ``azure|az|abfs|abfss://container/path`` + account(account_name=N)
  -> ``abfss://container@N.dfs.core.windows.net/path``
  + ``fs.azure.account.key.N.dfs.core.windows.net`` (account_key auth)
- ``s3|s3a://bucket/path`` -> ``s3a://bucket/path``
  + ``fs.s3a.access.key`` / ``fs.s3a.secret.key`` / ``fs.s3a.endpoint``
- relative path + data_path -> joined local path (ref real_uri)
- anything already ``scheme://`` passes through untouched

The result feeds the ordinary readers; wildcard expansion
(readers.expand_wildcard) already lists through the Hadoop FileSystem
API, so ``abfss://.../*`` configs expand server-side the same way
``file:`` ones do.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

_AZURE_SCHEMES = ("azure://", "az://", "abfs://", "abfss://")
_S3_SCHEMES = ("s3://", "s3a://")
#: any uri with a scheme prefix — including Hadoop's single-slash
#: ``file:/path`` form that FileSystem listings return
_HAS_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


class AccountConfigError(ValueError):
    pass


def normalize_uri(
    uri: str,
    account: str | None = None,
    accounts: dict[str, dict[str, str]] | None = None,
    data_path: str | None = None,
) -> tuple[str, dict[str, str]]:
    """-> (hadoop_uri, hadoop_conf). ``hadoop_conf`` keys are plain
    Hadoop keys (no ``spark.hadoop.`` prefix) — apply with
    :func:`apply_hadoop_conf` or bake into the session config."""
    opts = (accounts or {}).get(account, {}) if account else {}
    if any(uri.startswith(s) for s in _AZURE_SCHEMES):
        rest = uri.split("://", 1)[1]
        if "@" in rest.split("/", 1)[0]:
            # already container@host form — keep, just force abfss
            return f"abfss://{rest}", _azure_conf(opts)
        account_name = opts.get("account_name")
        if not account_name:
            raise AccountConfigError(
                f"azure uri {uri!r} needs an account with 'account_name'"
            )
        container, _, path = rest.partition("/")
        host = f"{account_name}.dfs.core.windows.net"
        hadoop_uri = f"abfss://{container}@{host}" + (f"/{path}" if path else "")
        return hadoop_uri, _azure_conf(opts)
    if any(uri.startswith(s) for s in _S3_SCHEMES):
        rest = uri.split("://", 1)[1]
        bucket = rest.split("/", 1)[0]
        return f"s3a://{rest}", _s3_conf(opts, bucket)
    if _HAS_SCHEME.match(uri):
        return uri, {}
    if account is not None:
        # schemeless uri WITH an account: the reference's real_uri only
        # joins data_path when account is None — 'container/path' plus
        # an adlfs account is a REMOTE path (source_uri.py:60-75), so a
        # local join would silently read the wrong filesystem. Route by
        # the account's credential shape.
        if opts.get("account_name"):
            return normalize_uri(f"abfss://{uri}", account, accounts, data_path)
        if any(k in opts for k in ("access_key_id", "secret_access_key", "endpoint")):
            return normalize_uri(f"s3a://{uri}", account, accounts, data_path)
        raise AccountConfigError(
            f"schemeless uri {uri!r} with account {account!r}: the account "
            "needs 'account_name' (azure) or s3 credentials to pick a scheme"
        )
    if data_path is not None and not os.path.isabs(uri):
        return os.path.join(data_path, uri), {}
    return uri, {}


def _azure_conf(opts: dict[str, str]) -> dict[str, str]:
    """adlfs-style account dict (ref accounts yaml: account_name,
    account_key, sas_token, anon) -> Hadoop ABFS auth settings."""
    account_name = opts.get("account_name")
    if not account_name:
        return {}
    host = f"{account_name}.dfs.core.windows.net"
    conf: dict[str, str] = {}
    if "account_key" in opts:
        conf[f"fs.azure.account.auth.type.{host}"] = "SharedKey"
        conf[f"fs.azure.account.key.{host}"] = opts["account_key"]
    elif "sas_token" in opts:
        conf[f"fs.azure.account.auth.type.{host}"] = "SAS"
        conf[f"fs.azure.sas.fixed.token.{host}"] = opts["sas_token"]
    elif opts.get("anon") in (True, "true", "True"):
        conf[f"fs.azure.account.auth.type.{host}"] = "Anonymous"
    return conf


def _s3_conf(opts: dict[str, str], bucket: str | None = None) -> dict[str, str]:
    """S3 credentials scoped PER BUCKET (``fs.s3a.bucket.<bucket>.*``,
    Hadoop's per-bucket configuration) rather than the session-global
    ``fs.s3a.*`` keys: two tables on two S3 accounts must not clobber
    each other's credentials (the Azure side gets the same isolation
    from its per-account-host key names). Without a bucket (no uri
    context) the keys fall back to global.

    Caveat that per-bucket keys do NOT remove: Hadoop's FileSystem
    cache is keyed by (scheme, authority) only, so ROTATING credentials
    for a bucket inside a live session won't take effect until the
    cached FileSystem is dropped — set ``fs.s3a.impl.disable.cache``
    when credentials must change mid-session."""
    prefix = f"fs.s3a.bucket.{bucket}." if bucket else "fs.s3a."
    conf: dict[str, str] = {}
    if "access_key_id" in opts:
        conf[f"{prefix}access.key"] = opts["access_key_id"]
    if "secret_access_key" in opts:
        conf[f"{prefix}secret.key"] = opts["secret_access_key"]
    if "endpoint" in opts:
        conf[f"{prefix}endpoint"] = opts["endpoint"]
    if "region" in opts:
        conf[f"{prefix}endpoint.region"] = opts["region"]
    if opts.get("anon") in (True, "true", "True"):
        conf[f"{prefix}aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"
        )
    return conf


def apply_hadoop_conf(spark: SparkSession, conf: dict[str, str]) -> None:
    """Set Hadoop settings on the LIVE session (per-account credentials
    arrive with table configs, after the session exists). Keys are
    scoped — fs.azure.account.key.<host> per Azure account,
    fs.s3a.bucket.<bucket>.* per S3 bucket — so tables on different
    storage accounts coexist in one session. Credential ROTATION for an
    already-touched bucket/host additionally needs the FileSystem cache
    disabled (see _s3_conf)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hconf.set(k, v)

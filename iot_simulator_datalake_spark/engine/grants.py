"""Unity-Catalog-style grants: registry, GRANT-SQL parser, engine
enforcement, and an audit log.

Reference parity: ``01-setup-sp-permissions.sql:1-36`` — the
reference's entire control plane is Unity Catalog ``GRANT`` statements
over catalog/schema/volume securables for a service principal, plus
``SHOW GRANTS`` introspection, and ``logs/query_log.sql`` reserves a
place for access logging.  OSS Spark has no grant model, so this is
the honest ENGINE-BOUNDARY analog: a driver-side registry — control-
plane metadata, bounded by the number of grants and principals, never
data-proportional — consulted by :class:`~.runner.Engine` before each
model materialization.  It cannot (and does not pretend to) stop a
caller who bypasses the engine and reads parquet paths directly; that
is exactly Unity Catalog's own boundary too (storage credentials sit
outside the grant model).

Semantics implemented (the UC rules the reference relies on):

- **Inheritance**: a privilege granted on a catalog is inherited by
  every schema in it, and a privilege granted on a schema by every
  securable in it (``GRANT SELECT ON SCHEMA`` covers the schema's
  tables; the reference grants at schema level for exactly this
  reason).
- **USE gating**: acting on anything inside a catalog requires
  ``USE CATALOG`` on the catalog, and acting on anything inside a
  schema additionally requires ``USE SCHEMA`` on the schema (either
  granted directly or inherited from the catalog).  Holding ``SELECT``
  without the ``USE`` chain grants nothing — the reason the
  reference's setup script grants ``USE CATALOG`` + ``USE SCHEMA``
  alongside the data privileges.
- **Securables**: ``CATALOG`` (name), ``SCHEMA`` (``catalog.schema``),
  ``VOLUME`` (``catalog.schema.volume`` — the reference's landing
  volume, privilege ``READ VOLUME``).

Every ``authorize`` decision is appended to :attr:`GrantRegistry.audit`
(principal, privilege, securable, allowed, ts) — the ``query_log``
analog, exposed as a DataFrame via :func:`audit_df`.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

#: privileges the reference's setup script uses (canonical spelling)
PRIVILEGES = ("USE CATALOG", "USE SCHEMA", "CREATE SCHEMA",
              "CREATE TABLE", "MODIFY", "SELECT", "READ VOLUME")

SECURABLE_TYPES = ("CATALOG", "SCHEMA", "VOLUME")


@dataclass(frozen=True)
class Grant:
    """One granted privilege on one securable to one principal."""

    principal: str
    privilege: str
    securable_type: str
    securable: str

    def __post_init__(self) -> None:
        if self.privilege not in PRIVILEGES:
            raise ValueError(f"unknown privilege {self.privilege!r} "
                             f"(known: {PRIVILEGES})")
        if self.securable_type not in SECURABLE_TYPES:
            raise ValueError(f"unknown securable type "
                             f"{self.securable_type!r}")
        want = {"CATALOG": 1, "SCHEMA": 2, "VOLUME": 3}[self.securable_type]
        if self.securable.count(".") != want - 1:
            raise ValueError(
                f"{self.securable_type} securable must have {want} "
                f"dot-separated part(s), got {self.securable!r}")


#: one GRANT statement: comma-separated privileges, one securable, one
#: backtick-quoted-or-bare principal (the reference's statement shape:
#: ``GRANT USE SCHEMA, CREATE TABLE, MODIFY, SELECT ON SCHEMA
#: dev_catalog.bronze TO `<sp-guid>`;``)
_GRANT_RE = re.compile(
    r"GRANT\s+(?P<privs>[A-Z][A-Z ,]*?)\s+"
    r"ON\s+(?P<stype>CATALOG|SCHEMA|VOLUME)\s+(?P<name>[\w.]+)\s+"
    r"TO\s+`?(?P<principal>[^`;\s]+)`?\s*;",
    re.IGNORECASE)


class GrantRegistry:
    """Driver-side grant store + authorization decisions + audit."""

    def __init__(self) -> None:
        self._grants: list[Grant] = []
        #: query_log analog: one row per authorize() decision
        self.audit: list[dict] = []

    # -- building ----------------------------------------------------------

    def grant(self, principal: str, privilege: str,
              securable_type: str, securable: str) -> "GrantRegistry":
        g = Grant(principal, privilege.upper(), securable_type.upper(),
                  securable)
        if g not in self._grants:       # grants are idempotent (UC)
            self._grants.append(g)
        return self

    def parse_sql(self, text: str) -> int:
        """Load every ``GRANT`` statement in ``text`` (the reference's
        setup-script dialect: ``-- comments``, multi-privilege lists,
        backticked principals; non-GRANT statements like ``SHOW
        GRANTS`` are ignored).  Returns the number of grants added."""
        before = len(self._grants)
        for m in _GRANT_RE.finditer(text):
            for priv in m.group("privs").split(","):
                self.grant(m.group("principal"), priv.strip().upper(),
                           m.group("stype").upper(), m.group("name"))
        return len(self._grants) - before

    # -- introspection (SHOW GRANTS) ---------------------------------------

    def show_grants(self, *, on: str | None = None,
                    to: str | None = None) -> list[Grant]:
        """``SHOW GRANTS ON <securable>`` / ``SHOW GRANTS TO
        <principal>`` (01-setup-sp-permissions.sql:35-36)."""
        return [g for g in self._grants
                if (on is None or g.securable == on)
                and (to is None or g.principal == to)]

    @property
    def grants(self) -> tuple[Grant, ...]:
        return tuple(self._grants)

    # -- decisions ---------------------------------------------------------

    def _held(self, principal: str, privilege: str,
              securables: Iterable[str]) -> bool:
        """Does ``principal`` hold ``privilege`` granted on ANY of
        ``securables`` (the securable itself + its ancestors —
        inheritance)?"""
        want = set(securables)
        return any(g.principal == principal and g.privilege == privilege
                   and g.securable in want for g in self._grants)

    def authorize(self, principal: str, privilege: str,
                  securable_type: str, securable: str) -> bool:
        """UC decision: the privilege (directly or inherited from an
        ancestor) AND the USE chain down to the securable's container.
        Records the decision in :attr:`audit`."""
        privilege = privilege.upper()
        securable_type = securable_type.upper()
        parts = securable.split(".")
        catalog = parts[0]
        ancestry = [".".join(parts[:i + 1]) for i in range(len(parts))]
        ok = self._held(principal, privilege, ancestry)
        # USE CATALOG gate: everything but the USE CATALOG grant itself
        if ok and not (securable_type == "CATALOG"
                       and privilege == "USE CATALOG"):
            ok = self._held(principal, "USE CATALOG", [catalog])
        # USE SCHEMA gate: acting INSIDE a schema (schema-level data
        # privileges, volumes) — either direct or catalog-inherited
        if ok and securable_type != "CATALOG" \
                and privilege != "USE SCHEMA":
            schema = ".".join(parts[:2])
            ok = self._held(principal, "USE SCHEMA", [catalog, schema])
        self.audit.append({
            "ts": time.time(), "principal": principal,
            "privilege": privilege, "securable_type": securable_type,
            "securable": securable, "allowed": ok})
        return ok

    def require(self, principal: str, privilege: str,
                securable_type: str, securable: str) -> None:
        """:meth:`authorize` or raise ``PermissionError`` with the
        precise missing piece named."""
        if not self.authorize(principal, privilege, securable_type,
                              securable):
            raise PermissionError(
                f"principal {principal!r} lacks {privilege} on "
                f"{securable_type} {securable} (or its USE CATALOG / "
                f"USE SCHEMA chain)")


def grants_df(spark: "SparkSession", reg: GrantRegistry) -> "DataFrame":
    """SHOW GRANTS as a DataFrame (control-plane-sized)."""
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([StructField(c, StringType())
                         for c in ("principal", "privilege",
                                   "securable_type", "securable")])
    return spark.createDataFrame(
        [(g.principal, g.privilege, g.securable_type, g.securable)
         for g in reg.grants], schema)


def audit_df(spark: "SparkSession", reg: GrantRegistry) -> "DataFrame":
    """The query_log analog (logs/query_log.sql): every authorization
    decision the engine made, as a DataFrame."""
    from pyspark.sql.types import (BooleanType, DoubleType, StringType,
                                   StructField, StructType)
    schema = StructType([
        StructField("ts", DoubleType()),
        StructField("principal", StringType()),
        StructField("privilege", StringType()),
        StructField("securable_type", StringType()),
        StructField("securable", StringType()),
        StructField("allowed", BooleanType())])
    return spark.createDataFrame(
        [(r["ts"], r["principal"], r["privilege"], r["securable_type"],
          r["securable"], r["allowed"]) for r in reg.audit], schema)

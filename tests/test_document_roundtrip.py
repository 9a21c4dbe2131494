"""The engine's core correctness contract: shred -> reconstruct ≡ identity.

Mirrors the reference's implicit contract that ``update()`` then
``retrieve()`` reproduces the API JSON (reference
``database/requests/__init__.py:31-58`` docstring; SURVEY.md §3.3, §5.2).

Comparison is canonical: keys sorted, nulls and empty containers dropped
(``to_json`` omits null struct fields; empty arrays shred to zero child
rows), and the documented coercions applied to the expected side
(dict specifics -> 1-element list, reference ``_modify_logs.py:31-32``).
"""

from __future__ import annotations

import json

import pytest

from jobcan_fixtures import canonicalize, make_request_docs
from jobcan_data_integrator_spark.operators.reconstruct import (
    reconstruct_request_documents,
)
from jobcan_data_integrator_spark.operators.shred import (
    parse_request_documents,
    shred_request_documents,
)

N_DOCS = 24


def _coerce_expected(doc: dict) -> dict:
    """Apply the engine's documented coercions to the raw input."""
    for ml in (doc.get("detail") or {}).get("modify_logs") or []:
        for dt in ml.get("detail") or []:
            sp = dt.get("specifics")
            if isinstance(sp, dict):
                dt["specifics"] = [sp]
    return doc


@pytest.fixture(scope="module")
def roundtrip(spark):
    raws = make_request_docs(N_DOCS)
    raw_df = spark.createDataFrame([(d,) for d in raws], "raw string")
    tables = shred_request_documents(parse_request_documents(raw_df))
    rebuilt = {
        r["id"]: json.loads(r["doc_json"])
        for r in reconstruct_request_documents(tables).collect()
    }
    expected = {d["id"]: _coerce_expected(d) for d in map(json.loads, raws)}
    return expected, rebuilt, tables


def test_all_documents_reconstructed(roundtrip):
    expected, rebuilt, _ = roundtrip
    assert sorted(rebuilt) == sorted(expected)


@pytest.mark.parametrize("doc_idx", range(N_DOCS))
def test_roundtrip_identity(roundtrip, doc_idx):
    expected, rebuilt, _ = roundtrip
    rid = f"sa-{doc_idx}"
    exp = canonicalize(expected[rid])
    got = canonicalize(rebuilt[rid])
    assert got == exp, (
        f"{rid}: first diff at "
        + next(
            (
                k
                for k in sorted(set(exp) | set(got))
                if exp.get(k) != got.get(k)
            ),
            "?",
        )
    )


def test_dedup_entities(roundtrip):
    _, _, tables = roundtrip
    # generic_masters deduped on natural key across item+cell scopes
    gm = tables["generic_masters"].collect()
    assert len(gm) == len({r.generic_master_id for r in gm})
    # shared shipping address across requests -> single row
    assert tables["shipping_address"].count() == 1
    # comments deduped within request; associations preserve both scopes
    assert tables["comment_associations"].count() > tables["comments"].count()
    # shared file ids deduped globally
    files = tables["files"].collect()
    assert len(files) == len({r.id for r in files})


def test_idempotent_reingest(spark, roundtrip):
    """Re-shredding the same documents yields identical surrogate keys."""
    _, _, tables = roundtrip
    raw_df = spark.createDataFrame(
        [(d,) for d in make_request_docs(N_DOCS)], "raw string"
    )
    again = shred_request_documents(parse_request_documents(raw_df))
    for name in ("customized_items", "expense_specific_rows", "comments", "files"):
        a = {tuple(r) for r in tables[name].collect()}
        b = {tuple(r) for r in again[name].collect()}
        assert a == b, f"{name} not idempotent"


def test_fix_journal_roundtrip(spark):
    """Shred -> reconstruct identity for the fix_journal entity family
    (reference fix_journal.py:86-135 write path, :152-205 retrieve)."""
    import json

    from jobcan_fixtures import canonicalize, make_entities
    from jobcan_data_integrator_spark import schemas
    from jobcan_data_integrator_spark.operators.entities import (
        parse_entities,
        shred_fix_journals,
    )
    from jobcan_data_integrator_spark.operators.reconstruct import (
        reconstruct_fix_journals,
    )

    raw_journals = make_entities(8)["fix_journals"]
    raw = spark.createDataFrame([(s,) for s in raw_journals], "raw string")
    t = shred_fix_journals(parse_entities(raw, schemas.FIX_JOURNAL_DDL))
    rebuilt = {
        r["journal_id"]: json.loads(r["journal_json"])
        for r in reconstruct_fix_journals(
            t["fix_journals"], t["custom_journal_items"]
        ).collect()
    }
    assert len(rebuilt) == len(raw_journals)

    def _norm(doc):
        # the child table keys rows by (journal_id, key): list order is not
        # representable, so compare the items as a key-sorted multiset
        items = doc.get("custom_journal_item_list")
        if items:
            doc["custom_journal_item_list"] = sorted(
                items, key=lambda it: (it.get("key") or "")
            )
        return canonicalize(doc)

    for s in raw_journals:
        d = json.loads(s)
        assert _norm(rebuilt[d["journal_id"]]) == _norm(d), d["journal_id"]


def test_retrieve_users_matches_python_replica(spark):
    """retrieve_users vs a pure-Python replica of the reference query
    (users.py:185-237), including the NULL sentinel and count-distinct
    guards; list order pinned to sorted (the reference's GROUP_CONCAT
    order is unspecified)."""
    import json

    from jobcan_fixtures import make_entities
    from jobcan_data_integrator_spark import schemas
    from jobcan_data_integrator_spark.operators.entities import (
        parse_entities,
        retrieve_users,
        shred_users,
    )

    raw_users = [json.loads(s) for s in make_entities(8)["users"]]
    raw = spark.createDataFrame(
        [(json.dumps(u, ensure_ascii=False),) for u in raw_users], "raw string"
    )
    t = shred_users(parse_entities(raw, schemas.USER_DDL))
    got = {r["id"]: r.asDict() for r in retrieve_users(t).collect()}
    assert len(got) == len(raw_users)

    for u in raw_users:
        row = got[u["id"]]
        gcs = u.get("user_groups") or []
        exp_groups = (
            ",".join(sorted({g if g is not None else "NULL" for g in gcs}))
            if any(g is not None for g in gcs)
            else None
        )
        assert row["groups"] == exp_groups, u["id"]

        ups = u.get("user_positions") or []
        if any(p.get("position_code") is not None for p in ups):
            exp_pos = sorted(
                {
                    json.dumps(
                        {
                            k: v
                            for k, v in (
                                ("position_code", p.get("position_code")),
                                ("group_code", p.get("group_code")),
                            )
                            if v is not None
                        },
                        ensure_ascii=False,
                        separators=(",", ":"),
                    )
                    for p in ups
                }
            )
            assert row["positions"] == ",".join(exp_pos), u["id"]
        else:
            assert row["positions"] is None, u["id"]

        ba = u.get("user_bank_account")
        if ba is None:
            assert row["bank_account"] is None, u["id"]
        else:
            exp_ba = {k: v for k, v in ba.items() if v is not None}
            assert json.loads(row["bank_account"]) == exp_ba, u["id"]

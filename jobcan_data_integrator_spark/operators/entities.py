"""Basic-entity normalization (the 7 non-request APIs).

Reference write path: ``database/users.py:88-182`` (nested sync),
``group.py:41-66``, ``positions.py:39-55``, ``project.py:37-53``,
``company.py:47-71``, ``forms.py:44-63``, ``fix_journal.py:86-135``.
Each API page is an array of flat-ish JSON entities; users carry three
child collections, fix_journals one.

All functions take a DataFrame of parsed entity structs (column ``e``)
and return the normalized table(s).  Sync semantics (delete of removed
child rows, N14) live in operators/sync.py — these are pure projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jobcan_data_integrator_spark import schemas


def parse_entities(raw: DataFrame, ddl: str, column: str = "raw") -> DataFrame:
    return raw.select(F.from_json(F.col(column), ddl).alias("e"))


def shred_users(users: DataFrame) -> dict[str, DataFrame]:
    """users + user_groups + user_positions + user_bank_accounts
    (reference users.py:101-180)."""
    e = users.select("e.*")
    out = {
        "users": e.select(
            "id",
            "user_code",
            "email",
            "last_name",
            "first_name",
            "is_approver",
            "user_role",
            "memo",
        )
    }
    out["user_groups"] = e.select(
        F.col("id").alias("user_id"), F.explode("user_groups").alias("group_code")
    )
    out["user_positions"] = e.select(
        F.col("id").alias("user_id"), F.explode("user_positions").alias("p")
    ).select(
        "user_id",
        F.col("p.position_code").alias("position_code"),
        F.col("p.group_code").alias("group_code"),
    )
    ba = F.col("user_bank_account")
    out["user_bank_accounts"] = e.filter(ba.isNotNull()).select(
        F.col("id").alias("user_id"),
        *[
            ba[c].alias(c)
            for c in (
                "bank_code",
                "bank_name",
                "bank_name_kana",
                "branch_code",
                "branch_name",
                "branch_name_kana",
                "bank_account_type_code",
                "bank_account_code",
                "bank_account_name_kana",
            )
        ],
    )
    return out


def _flat(df: DataFrame) -> DataFrame:
    return df.select("e.*")


shred_groups = _flat  # group.py:52-64 (insert-only semantics in sync layer)
shred_positions = _flat
shred_projects = _flat
shred_companies = _flat
shred_forms = _flat


def shred_fix_journals(fj: DataFrame) -> dict[str, DataFrame]:
    """fix_journals + custom_journal_items (reference fix_journal.py:97-133)."""
    e = fj.select("e.*")
    return {
        "fix_journals": e.drop("custom_journal_item_list"),
        "custom_journal_items": e.select(
            F.col("journal_id"), F.explode("custom_journal_item_list").alias("it")
        ).select(
            "journal_id",
            F.col("it.key").alias("key"),
            F.col("it.value").alias("value"),
            F.col("it.generic_master_record_code").alias("generic_master_record_code"),
        ),
    }


#: API name -> (entity DDL, shred fn) — the dispatch table the gateway uses
#: (reference gateway.py:245-275).
ENTITY_APIS = {
    "users": (schemas.USER_DDL, shred_users),
    "groups": (schemas.GROUP_DDL, shred_groups),
    "positions": (schemas.POSITION_DDL, shred_positions),
    "projects": (schemas.PROJECT_DDL, shred_projects),
    "companies": (schemas.COMPANY_DDL, shred_companies),
    "forms": (schemas.FORM_DDL, shred_forms),
    "fix_journals": (schemas.FIX_JOURNAL_DDL, shred_fix_journals),
}


def retrieve_users(t: dict[str, DataFrame]) -> DataFrame:
    """One row per user with child collections re-aggregated — the read
    path of the user family (reference users.py:185-237: GROUP_CONCAT
    with DISTINCT + NULL sentinel, correlated json_object per bank row).

    Deviations, both deliberate: SQLite's GROUP_CONCAT order is
    nondeterministic, so both concatenated lists are pinned to sorted
    order; JSON rendering omits null fields (to_json), matching the
    document-reconstruct path. The reference's single fan-out join +
    bare GROUP BY becomes three independent pre-aggregations joined on
    user_id — same result, no row explosion, each aggregation partial-
    combines map-side.
    """
    gc = F.col("group_code").cast("string")
    groups = (
        t["user_groups"]
        .groupBy("user_id")
        .agg(
            F.when(
                F.countDistinct("group_code") > 0,
                F.array_join(
                    F.array_sort(F.collect_set(F.coalesce(gc, F.lit("NULL")))), ","
                ),
            ).alias("groups")
        )
    )
    positions = (
        t["user_positions"]
        .groupBy("user_id")
        .agg(
            F.when(
                F.countDistinct("position_code") > 0,
                F.array_join(
                    F.array_sort(
                        F.collect_set(F.to_json(F.struct("position_code", "group_code")))
                    ),
                    ",",
                ),
            ).alias("positions")
        )
    )
    bank_cols = [c for c in t["user_bank_accounts"].columns if c != "user_id"]
    bank = t["user_bank_accounts"].select(
        "user_id", F.to_json(F.struct(*bank_cols)).alias("bank_account")
    )
    u = t["users"].withColumnRenamed("id", "user_id")
    out = u
    for part in (groups, positions, bank):
        out = out.join(part, "user_id", "left")
    return out.withColumnRenamed("user_id", "id")

"""Document reconstruction: silver tables -> the original nested JSON.

Inverse of ``operators/shred.py``; the engine's equivalent of the
reference's ``retrieve`` path, which reassembles the API document with
correlated ``JSON_GROUP_ARRAY``/``JSON_OBJECT`` subqueries per parent row
(reference A6 family: ``_requests.py:137-199``, ``_expense.py:266-361``,
``_approval_process.py:254-367``, ``_customized_items.py:172-235``,
``_default_attachment_files.py:59-86`` — SURVEY.md §2.5-A6, §3.3).

Spark-first shape: bottom-up ``groupBy + collect_list(struct)`` per level,
ordering pinned by ``array_sort`` on the stored positional index (never on
incidental row order), joined upward level by level — one shuffle per
nesting level, each keyed on the parent id, no correlated subqueries.

``shred -> reconstruct ≡ identity`` (modulo documented coercions: dict
specifics become 1-element lists, duplicate default attachments collapse
to repeat counters and are re-expanded with ``explode(array_repeat)``) is
the engine's core correctness contract, tested in
tests/test_document_roundtrip.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.shred import (
    PARENT_APPROVAL_STEP,
    PARENT_CUSTOMIZED_ITEM,
    PARENT_EXPENSE_ROW,
    PARENT_PAYMENT_ROW,
    REQUEST_HEADER_COLS,
)

_FILE_FIELDS = ["name", "type", "user_name", "date", "deleted"]


def _sorted_arr(df: DataFrame, keys: list[str], idx: str, payload: Column, alias: str) -> DataFrame:
    """groupBy(keys) -> array of payload ordered by the positional index."""
    item = F.struct(F.col(idx).alias("_i"), payload.alias("_p"))
    # comparator touches only the int index — payloads may contain VARIANT,
    # which has no natural ordering
    by_idx = lambda l, r: F.when(l["_i"] < r["_i"], -1).when(l["_i"] > r["_i"], 1).otherwise(0)  # noqa: E731
    return df.groupBy(*keys).agg(
        F.transform(F.array_sort(F.collect_list(item), by_idx), lambda x: x["_p"]).alias(alias)
    )


def _json_string_literal(col: Column) -> Column:
    """Render a string column as a JSON string literal (escaped, quoted) by
    wrapping it in a 1-element JSON array and stripping the brackets."""
    j = F.to_json(F.array(col))  # ["escaped"]
    return F.substring(j, 2, F.length(j) - 2)


def reconstruct_request_documents(t: dict[str, DataFrame]) -> DataFrame:
    """Rebuild one nested document per request from the silver tables.

    Returns a DataFrame ``(id string, doc_json string)`` where doc_json is
    the canonical JSON of the reassembled document.
    """
    # --- generic_master structs ------------------------------------------
    gm_items = _sorted_arr(
        t["generic_master_additional_items"],
        ["generic_master_id"],
        "item_index",
        F.col("value"),
        "additional_items",
    )
    gm = (
        t["generic_masters"]
        .join(gm_items, "generic_master_id", "left")
        .select(
            "generic_master_id",
            F.struct("record_name", "record_code", "additional_items").alias("gm"),
        )
    )

    # --- files per scope --------------------------------------------------
    file_struct = F.struct(
        F.col("id"), *[F.col(c) for c in _FILE_FIELDS]
    )
    fa = (
        t["file_associations"]
        .join(t["files"], t["file_associations"].file_id == t["files"].id)
        .select("request_id", "parent_type", "parent_id", "file_index", file_struct.alias("f"))
    )

    def files_for(parent_type: str, key: str) -> DataFrame:
        scoped = fa.filter(F.col("parent_type") == parent_type)
        group_key = "parent_id" if parent_type != "after_completion" else "request_id"
        return _sorted_arr(scoped, [group_key], "file_index", F.col("f"), "files").withColumnRenamed(
            group_key, key
        )

    # --- customized_items + 2-D table ------------------------------------
    cell = t["table_data"].join(gm, "generic_master_id", "left")
    cell_struct = F.struct(
        F.col("column_number"), F.col("value"), F.col("gm").alias("generic_master")
    )
    trows = _sorted_arr(
        cell, ["customized_item_id", "index_1"], "index_2", cell_struct, "cells"
    )
    table2d = _sorted_arr(
        trows, ["customized_item_id"], "index_1", F.col("cells"), "table"
    )

    ci = (
        t["customized_items"]
        .join(gm, "generic_master_id", "left")
        .join(table2d, "customized_item_id", "left")
        .join(files_for(PARENT_CUSTOMIZED_ITEM, "customized_item_id"), "customized_item_id", "left")
    )
    ci_struct = F.struct(
        F.col("title"),
        F.col("content"),
        F.col("gm").alias("generic_master"),
        F.col("files"),
        F.col("table"),
    )
    ci_arr = _sorted_arr(ci, ["request_id"], "item_index", ci_struct, "customized_items")

    # --- custom_items (union-typed value) --------------------------------
    ext_arr = _sorted_arr(
        t["custom_item_value_extension_items"],
        ["custom_item_id"],
        "item_index",
        F.struct("name", "value"),
        "extension_items",
    )
    civ = (
        t["custom_item_values"]
        .join(ext_arr, "custom_item_id", "left")
        .select(
            "custom_item_id",
            F.to_json(
                F.struct(
                    "generic_master_code",
                    "generic_master_record_name",
                    "generic_master_record_code",
                    "content",
                    "memo",
                    "extension_items",
                )
            ).alias("obj_json"),
        )
    )
    cui = t["custom_items"].join(civ, "custom_item_id", "left")
    value_json = F.when(
        F.col("value_str").isNotNull(), _json_string_literal(F.col("value_str"))
    ).otherwise(F.col("obj_json"))
    cui_struct = F.struct(
        F.col("name"),
        F.col("item_type"),
        F.parse_json(value_json).alias("value"),
    )
    cui_arr = _sorted_arr(
        cui, ["expense_specific_row_id"], "item_index", cui_struct, "custom_items"
    )

    # --- expense ----------------------------------------------------------
    erow = (
        t["expense_specific_rows"]
        .join(cui_arr, "expense_specific_row_id", "left")
        .join(files_for(PARENT_EXPENSE_ROW, "expense_specific_row_id"), "expense_specific_row_id", "left")
    )
    erow_struct = F.struct(
        *[F.col(c) for c in ("row_number", "use_date", "group_name", "project_name",
                             "content_description", "breakdown", "amount")],
        F.col("custom_items"),
        F.col("files"),
    )
    erow_arr = _sorted_arr(erow, ["expense_specific_id"], "row_index", erow_struct, "rows")

    esp = t["expense_specifics"].join(erow_arr, "expense_specific_id", "left")
    esp_struct = F.struct(F.col("type"), F.col("rows"))
    esp_arr = _sorted_arr(esp, ["request_id"], "col_number", esp_struct, "specifics")

    expense = (
        t["expense"]
        .join(esp_arr, "request_id", "left")
        .select(
            "request_id",
            F.struct(
                *[F.col(c) for c in ("amount", "related_request_title", "related_request_id",
                                     "use_suspense_payment", "content_description",
                                     "advanced_payment", "suspense_payment_amount")],
                F.col("specifics"),
            ).alias("expense"),
        )
    )

    # --- payment ----------------------------------------------------------
    prow = t["payment_specific_rows"].join(
        files_for(PARENT_PAYMENT_ROW, "payment_specific_row_id"), "payment_specific_row_id", "left"
    )
    prow_struct = F.struct(
        *[F.col(c) for c in ("company_name", "zip_code", "address", "bank_name",
                             "bank_name_kana", "bank_account_name_kana", "bank_code",
                             "branch_code", "row_number", "use_date", "group_name",
                             "project_name", "content_description", "breakdown", "amount")],
        F.col("files"),
    )
    prow_arr = _sorted_arr(prow, ["payment_specific_id"], "row_index", prow_struct, "rows")
    psp = t["payment_specifics"].join(prow_arr, "payment_specific_id", "left")
    psp_arr = _sorted_arr(
        psp, ["request_id"], "col_number", F.struct(F.col("type"), F.col("rows")), "specifics"
    )
    payment = (
        t["payment"]
        .join(psp_arr, "request_id", "left")
        .select(
            "request_id",
            F.struct(
                *[F.col(c) for c in ("amount", "related_request_title",
                                     "related_request_id", "content_description")],
                F.col("specifics"),
            ).alias("payment"),
        )
    )

    # --- ec ---------------------------------------------------------------
    ec_rows = _sorted_arr(
        t["ec_specific_rows"],
        ["ec_specific_id"],
        "row_index",
        F.struct(*[F.col(c) for c in ("item_name", "item_url", "item_id",
                                      "manufacturer_name", "sold_by", "fulfilled_by",
                                      "unit_price", "quantity", "subtotal")]),
        "rows",
    )
    ecs = (
        t["ec_specifics"]
        .join(ec_rows, "ec_specific_id", "left")
        .select(
            "ec_id",
            F.struct(
                *[F.col(c) for c in ("order_id", "retention_deadline", "tax_amount",
                                     "shipping_amount", "total_price", "total_amount")],
                F.col("rows"),
            ).alias("specifics"),
        )
    )
    sa_struct = F.struct(
        *[F.col(c) for c in ("shipping_address_name", "zip_code", "country", "state",
                             "city", "address1", "address2", "company_name",
                             "contact_name", "tel", "email")]
    )
    sa = t["shipping_address"].select("shipping_address_id", sa_struct.alias("shipping_address"))
    ec = (
        t["ec"]
        .join(sa, "shipping_address_id", "left")
        .join(ecs, "ec_id", "left")
        .select(
            "request_id",
            F.struct(
                *[F.col(c) for c in ("related_request_id", "related_request_title",
                                     "content_description", "billing_destination")],
                F.col("shipping_address"),
                F.col("specifics"),
            ).alias("ec"),
        )
    )

    # --- approval process -------------------------------------------------
    approver_struct = F.struct(
        *[F.col(c) for c in ("status", "approved_date", "approver_name",
                             "approver_code", "proxy_approver_name", "proxy_approver_code")]
    )
    approvers = _sorted_arr(
        t["approvers"], ["approval_step_id"], "approver_index", approver_struct, "approvers"
    )

    ca = t["comment_associations"].join(t["comments"].drop("request_id"), "comment_id")
    comment_struct = F.struct(
        F.col("user_name"), F.col("date"), F.col("text"), F.col("deleted")
    )
    step_comments = _sorted_arr(
        ca.filter(~F.col("after_completion")),
        ["approval_step_id"],
        "comment_index",
        comment_struct,
        "comments",
    )
    ac_comments = _sorted_arr(
        ca.filter(F.col("after_completion")),
        ["request_id"],
        "comment_index",
        comment_struct,
        "comments",
    )

    steps = (
        t["approval_steps"]
        .join(approvers, "approval_step_id", "left")
        .join(step_comments, "approval_step_id", "left")
        .join(files_for(PARENT_APPROVAL_STEP, "approval_step_id"), "approval_step_id", "left")
    )
    step_struct = F.struct(
        F.col("name"),
        F.col("condition"),
        F.col("status"),
        F.col("approvers"),
        F.col("comments"),
        F.col("files"),
    )
    steps_arr = _sorted_arr(steps, ["approval_process_id"], "step_index", step_struct, "steps")

    route_logs = _sorted_arr(
        t["approval_route_modify_logs"],
        ["approval_process_id"],
        "log_index",
        F.struct("date", "user_name"),
        "approval_route_modify_logs",
    )
    ac_files = files_for("after_completion", "request_id").withColumnRenamed("files", "ac_files")
    ap = (
        t["approval_process"]
        .join(route_logs, "approval_process_id", "left")
        .join(steps_arr, "approval_process_id", "left")
        .join(ac_comments.withColumnRenamed("comments", "ac_comments"), "request_id", "left")
        .join(ac_files, "request_id", "left")
        .select(
            "request_id",
            F.struct(
                F.col("is_route_changed_by_applicant"),
                F.col("approval_route_modify_logs"),
                F.col("steps"),
                F.when(
                    F.col("ac_comments").isNotNull() | F.col("ac_files").isNotNull(),
                    F.struct(
                        F.col("ac_comments").alias("comments"),
                        F.col("ac_files").alias("files"),
                    ),
                ).alias("after_completion"),
            ).alias("approval_process"),
        )
    )

    # --- viewers / modify_logs -------------------------------------------
    viewer_struct = F.struct(
        F.col("user_name"),
        F.col("status"),
        F.col("group_name").alias("group"),
        F.col("position"),
    )
    viewers = _sorted_arr(t["viewers"], ["request_id"], "viewer_index", viewer_struct, "viewers")

    spec_arr = _sorted_arr(
        t["modify_log_detail_specifics"],
        ["modify_log_detail_id"],
        "specific_index",
        F.struct("status", "difference"),
        "raw_specifics",
    )
    mld = (
        t["modify_log_details"]
        .join(spec_arr, "modify_log_detail_id", "left")
        .withColumn("specifics", F.parse_json(F.to_json(F.col("raw_specifics"))))
    )
    mld_struct = F.struct(
        F.col("title"), F.col("old"), F.col("new"), F.col("log_type"), F.col("specifics")
    )
    mld_arr = _sorted_arr(mld, ["modify_log_id"], "log_detail_index", mld_struct, "detail")
    mlog = t["modify_logs"].join(mld_arr, "modify_log_id", "left")
    ml_arr = _sorted_arr(
        mlog,
        ["request_id"],
        "log_index",
        F.struct(F.col("date"), F.col("user_name"), F.col("detail")),
        "modify_logs",
    )

    # --- default attachments: re-expand repeat counters -------------------
    daf = (
        t["default_attachment_files"]
        .join(t["files"], t["default_attachment_files"].file_id == t["files"].id)
        .select(
            "request_id",
            "first_index",
            F.explode(
                F.array_repeat(file_struct, F.col("n_repeat").cast("int"))
            ).alias("f"),
        )
    )
    daf_arr = _sorted_arr(daf, ["request_id"], "first_index", F.col("f"), "default_attachment_files")

    # --- assemble ---------------------------------------------------------
    req = t["requests"].withColumnRenamed("id", "request_id")
    for part in (ci_arr, expense, payment, ec, ap, viewers, ml_arr, daf_arr):
        req = req.join(part, "request_id", "left")

    detail = F.struct(
        F.col("customized_items"),
        F.col("expense"),
        F.col("payment"),
        F.col("ec"),
        F.col("approval_process"),
        F.col("viewers"),
        F.col("modify_logs"),
        F.col("default_attachment_files"),
    )
    header = [
        (F.col("request_id") if c == "id" else F.col(c)).alias(c)
        for c in REQUEST_HEADER_COLS
    ]
    return req.select(
        F.col("request_id").alias("id"),
        F.to_json(F.struct(*header, detail.alias("detail"))).alias("doc_json"),
    )


def reconstruct_fix_journals(
    fix_journals: DataFrame, custom_journal_items: DataFrame
) -> DataFrame:
    """(journal_id, journal_json): rebuild the ``/v1/fix_journal/`` API JSON
    from the two silver tables — reference ``fix_journal.py:152-205`` parity
    (the JSON_OBJECT + correlated JSON_GROUP_ARRAY retrieve).

    The reference's group-array has no ORDER BY — it rides SQLite rowid
    insertion order, which REPLACE churn scrambles; the child table keys
    rows by (journal_id, key), so the representable contract is a
    per-key multiset.  We pin the rebuilt list to key order: deterministic
    and stable under re-ingest.
    """
    items = custom_journal_items.groupBy("journal_id").agg(
        F.array_sort(
            F.collect_list(F.struct("key", "value", "generic_master_record_code"))
        ).alias("custom_journal_item_list")
    )
    j = fix_journals.join(items, "journal_id", "left")
    cols = [F.col(c) for c in fix_journals.columns]
    return j.select(
        "journal_id",
        F.to_json(
            F.struct(*cols, F.col("custom_journal_item_list"))
        ).alias("journal_json"),
    )

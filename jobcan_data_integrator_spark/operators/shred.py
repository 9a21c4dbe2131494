"""Request-document shredding: nested JSON -> the normalized silver tables.

The write path of the engine (reference operator family N1-N13,
``database/requests/*`` — see SURVEY.md §2.2).  The reference walks each
JSON array in Python with ``enumerate`` and upserts row-at-a-time with the
index in the key; here every level is one ``posexplode`` projection, so the
whole pipeline is Catalyst-native, shuffle-free until the dedup-entity
aggregations, and scales linearly with document count.

Design decisions vs the reference (documented divergences, SURVEY.md §4.4):

- surrogate keys are deterministic hashes (operators/_keys.py), not
  autoincrement+read-back;
- child tables are full snapshots per document, so re-ingesting a request
  with a shorter list cannot leave stale tail rows (the reference's broken
  tail-trim DELETE, ``_expense.py:184-193``);
- comment/file associations keep one row per (document, scope) so the
  shred->reconstruct round trip is lossless (the reference's UNIQUE
  comment_id association silently drops cross-scope duplicates).

Positional keys: every child list carries its array index, mirroring
``UNIQUE (request_id, item_index)`` etc. (``_table_init.py:85,97,329``).

Every per-request child table also carries a ``request_id`` lineage
column (the reference's grandchild tables reach the request only through
FK chains).  That buys two things at scale: uniform
full-snapshot-per-document MERGE (storage.sync_children scoped by
request_id — no FK-chase deletes) and request/date partition pruning on
100 TB child tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators._keys import hkey, null_safe
from jobcan_data_integrator_spark.schemas import REQUEST_DOC_DDL

#: requests header columns (reference ``_requests.py:72-92``).
REQUEST_HEADER_COLS = [
    "id",
    "title",
    "status",
    "form_id",
    "form_name",
    "form_type",
    "settlement_type",
    "applied_date",
    "applicant_code",
    "applicant_last_name",
    "applicant_first_name",
    "applicant_group_name",
    "applicant_group_code",
    "applicant_position_name",
    "proxy_applicant_last_name",
    "proxy_applicant_first_name",
    "group_name",
    "group_code",
    "project_name",
    "project_code",
    "flow_step_name",
    "is_content_changed",
    "total_amount",
    "pay_at",
    "final_approval_period",
    "final_approved_date",
]

_FILE_COLS = ["id", "name", "type", "user_name", "date", "deleted"]

#: file-association parent scopes (reference slot columns 0-4 + the
#: default-attachment repeat counter, ``_table_init.py:417-446``).
PARENT_CUSTOMIZED_ITEM = "customized_item"
PARENT_EXPENSE_ROW = "expense_specific_row"
PARENT_PAYMENT_ROW = "payment_specific_row"
PARENT_APPROVAL_STEP = "approval_step"
PARENT_AFTER_COMPLETION = "after_completion"
PARENT_DEFAULT_ATTACHMENT = "default_attachment"


def parse_request_documents(raw: DataFrame, column: str = "raw") -> DataFrame:
    """Parse raw JSON documents with the explicit schema (PERMISSIVE)."""
    return raw.select(F.from_json(F.col(column), REQUEST_DOC_DDL).alias("doc"))


def _gm_id(prefix: Column, gm: Column) -> Column:
    """Deterministic id of a generic_master on its dedup natural key
    (record_name, record_code, additional_items — reference
    ``_data_class.py:345-380``)."""
    return F.when(
        gm.isNotNull(),
        F.xxhash64(
            F.lit("gm"),
            null_safe(gm["record_name"]),
            null_safe(gm["record_code"]),
            null_safe(F.to_json(gm["additional_items"])),
        ),
    )


class ShreddedTables(dict):
    """table name -> DataFrame, remembering the shred-internal cached
    intermediates so callers can release them once the writes finish."""

    def __init__(self, tables: dict[str, DataFrame], cached: list[DataFrame]) -> None:
        super().__init__(tables)
        self._cached = list(cached)

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()
        self._cached = []


def shred_request_documents(docs: DataFrame) -> "ShreddedTables":
    """Shred parsed request documents into the silver tables.

    ``docs`` has one ``doc`` column typed as REQUEST_DOC_DDL.  Returns a
    dict table_name -> DataFrame covering the full request-side catalog
    (SURVEY.md §1.4); call ``.unpersist()`` on it after consuming the
    tables to drop the internal caches.
    """
    cached: list[DataFrame] = []

    def _keep(df: DataFrame) -> DataFrame:
        """Cache a multiply-consumed intermediate and remember it so the
        caller can release it after the writes (ShreddedTables.unpersist)
        — a long-lived session would otherwise accumulate one cache set
        per shred call."""
        df = df.cache()
        cached.append(df)
        return df

    d = docs.select("doc.*").transform(_keep)
    out: dict[str, DataFrame] = {}

    out["requests"] = d.select(*REQUEST_HEADER_COLS)

    rid = F.col("id").alias("request_id")

    # --- customized_items + 2-D table + generic_masters (N2-N4) -----------
    ci = (
        d.select(rid, F.posexplode("detail.customized_items").alias("item_index", "ci"))
        .withColumn("customized_item_id", hkey("ci", "request_id", "item_index"))
        .transform(_keep)
    )
    out["customized_items"] = ci.select(
        "request_id",
        "item_index",
        "customized_item_id",
        F.col("ci.title").alias("title"),
        F.col("ci.content").alias("content"),
        _gm_id(F.lit("gm"), F.col("ci.generic_master")).alias("generic_master_id"),
    )

    cells = (
        ci.select(
            "request_id",
            "customized_item_id",
            F.posexplode("ci.table").alias("index_1", "row"),
        )
        .select(
            "request_id",
            "customized_item_id",
            "index_1",
            F.posexplode("row").alias("index_2", "cell"),
        )
        .withColumn(
            "table_data_id", hkey("td", "customized_item_id", "index_1", "index_2")
        )
        .transform(_keep)
    )
    out["table_data"] = cells.select(
        "request_id",
        "customized_item_id",
        "index_1",
        "index_2",
        "table_data_id",
        F.col("cell.column_number").alias("column_number"),
        F.col("cell.value").alias("value"),
        _gm_id(F.lit("gm"), F.col("cell.generic_master")).alias("generic_master_id"),
    )

    gm_scopes = ci.select(F.col("ci.generic_master").alias("gm")).unionByName(
        cells.select(F.col("cell.generic_master").alias("gm"))
    )
    gms = (
        gm_scopes.filter(F.col("gm").isNotNull())
        .withColumn("generic_master_id", _gm_id(F.lit("gm"), F.col("gm")))
        .dropDuplicates(["generic_master_id"])
        .transform(_keep)
    )
    out["generic_masters"] = gms.select(
        "generic_master_id",
        F.col("gm.record_name").alias("record_name"),
        F.col("gm.record_code").alias("record_code"),
    )
    out["generic_master_additional_items"] = gms.select(
        "generic_master_id",
        F.posexplode("gm.additional_items").alias("item_index", "value"),
    )

    # --- expense subtree (N5) ---------------------------------------------
    exp = d.select(rid, F.col("detail.expense").alias("e")).filter(
        F.col("e").isNotNull()
    )
    out["expense"] = exp.select(
        "request_id",
        hkey("exp", "request_id").alias("expense_id"),
        F.col("e.amount").alias("amount"),
        F.col("e.related_request_title").alias("related_request_title"),
        F.col("e.related_request_id").alias("related_request_id"),
        F.col("e.use_suspense_payment").alias("use_suspense_payment"),
        F.col("e.content_description").alias("content_description"),
        F.col("e.advanced_payment").alias("advanced_payment"),
        F.col("e.suspense_payment_amount").alias("suspense_payment_amount"),
    )

    esp = d.select(
        rid, F.posexplode("detail.expense.specifics").alias("col_number", "sp")
    ).withColumn("expense_specific_id", hkey("es", "request_id", "col_number"))
    out["expense_specifics"] = esp.select(
        "request_id",
        "col_number",
        "expense_specific_id",
        F.col("sp.type").alias("type"),
    )

    erow = (
        esp.select(
            "request_id",
            "expense_specific_id",
            F.posexplode("sp.rows").alias("row_index", "r"),
        )
        .withColumn(
            "expense_specific_row_id",
            hkey("esr", "expense_specific_id", "row_index"),
        )
        .transform(_keep)
    )
    out["expense_specific_rows"] = erow.select(
        "request_id",
        "expense_specific_id",
        "row_index",
        "expense_specific_row_id",
        F.col("r.row_number").alias("row_number"),
        F.col("r.use_date").alias("use_date"),
        F.col("r.group_name").alias("group_name"),
        F.col("r.project_name").alias("project_name"),
        F.col("r.content_description").alias("content_description"),
        F.col("r.breakdown").alias("breakdown"),
        F.col("r.amount").alias("amount"),
    )

    # custom_items with the union-typed value (string | object) ------------
    cui = (
        erow.select(
            "request_id",
            "expense_specific_row_id",
            F.posexplode("r.custom_items").alias("item_index", "x"),
        )
        .withColumn(
            "custom_item_id", hkey("cui", "expense_specific_row_id", "item_index")
        )
        .withColumn("_is_obj", F.expr("schema_of_variant(x.value) like 'OBJECT%'"))
        .transform(_keep)
    )
    out["custom_items"] = cui.select(
        "request_id",
        "expense_specific_row_id",
        "item_index",
        "custom_item_id",
        F.col("x.name").alias("name"),
        F.col("x.item_type").alias("item_type"),
        F.when(
            ~F.col("_is_obj"), F.expr("try_variant_get(x.value, '$', 'string')")
        ).alias("value_str"),
    )
    obj = cui.filter(F.col("_is_obj"))
    out["custom_item_values"] = obj.select(
        "request_id",
        "custom_item_id",
        F.expr("try_variant_get(x.value, '$.generic_master_code', 'string')").alias(
            "generic_master_code"
        ),
        F.expr(
            "try_variant_get(x.value, '$.generic_master_record_name', 'string')"
        ).alias("generic_master_record_name"),
        F.expr(
            "try_variant_get(x.value, '$.generic_master_record_code', 'string')"
        ).alias("generic_master_record_code"),
        F.expr("try_variant_get(x.value, '$.content', 'string')").alias("content"),
        F.expr("try_variant_get(x.value, '$.memo', 'string')").alias("memo"),
    )
    out["custom_item_value_extension_items"] = obj.select(
        "request_id",
        "custom_item_id",
        F.posexplode(
            F.expr(
                "try_variant_get(x.value, '$.extension_items',"
                " 'array<struct<name:string,value:string>>')"
            )
        ).alias("item_index", "ext"),
    ).select(
        "request_id",
        "custom_item_id",
        "item_index",
        F.col("ext.name").alias("name"),
        F.col("ext.value").alias("value"),
    )

    # --- payment subtree (N6) ---------------------------------------------
    pay = d.select(rid, F.col("detail.payment").alias("p")).filter(
        F.col("p").isNotNull()
    )
    out["payment"] = pay.select(
        "request_id",
        hkey("pay", "request_id").alias("payment_id"),
        F.col("p.amount").alias("amount"),
        F.col("p.related_request_title").alias("related_request_title"),
        F.col("p.related_request_id").alias("related_request_id"),
        F.col("p.content_description").alias("content_description"),
    )
    psp = d.select(
        rid, F.posexplode("detail.payment.specifics").alias("col_number", "sp")
    ).withColumn("payment_specific_id", hkey("ps", "request_id", "col_number"))
    out["payment_specifics"] = psp.select(
        "request_id", "col_number", "payment_specific_id", F.col("sp.type").alias("type")
    )
    prow = (
        psp.select(
            "request_id", "payment_specific_id", F.posexplode("sp.rows").alias("row_index", "r")
        )
        .withColumn(
            "payment_specific_row_id", hkey("psr", "payment_specific_id", "row_index")
        )
        .transform(_keep)
    )
    out["payment_specific_rows"] = prow.select(
        "request_id",
        "payment_specific_id",
        "row_index",
        "payment_specific_row_id",
        *[
            F.col(f"r.{c}").alias(c)
            for c in (
                "company_name",
                "zip_code",
                "address",
                "bank_name",
                "bank_name_kana",
                "bank_account_name_kana",
                "bank_code",
                "branch_code",
                "row_number",
                "use_date",
                "group_name",
                "project_name",
                "content_description",
                "breakdown",
                "amount",
            )
        ],
    )

    # --- ec subtree + deduped shipping_address (N7-N8) --------------------
    ec = d.select(rid, F.col("detail.ec").alias("ec")).filter(
        F.col("ec").isNotNull()
    ).transform(_keep)
    sa = F.col("ec.shipping_address")
    sa_cols = [
        "shipping_address_name",
        "zip_code",
        "country",
        "state",
        "city",
        "address1",
        "address2",
        "company_name",
        "contact_name",
        "tel",
        "email",
    ]
    sa_id = F.when(
        sa.isNotNull(),
        F.xxhash64(F.lit("sa"), *[null_safe(sa[c]) for c in sa_cols]),
    )
    out["shipping_address"] = (
        ec.filter(sa.isNotNull())
        .select(
            sa_id.alias("shipping_address_id"),
            *[sa[c].alias(c) for c in sa_cols],
        )
        .dropDuplicates(["shipping_address_id"])
    )
    out["ec"] = ec.select(
        "request_id",
        hkey("ec", "request_id").alias("ec_id"),
        F.col("ec.related_request_id").alias("related_request_id"),
        F.col("ec.related_request_title").alias("related_request_title"),
        F.col("ec.content_description").alias("content_description"),
        F.col("ec.billing_destination").alias("billing_destination"),
        sa_id.alias("shipping_address_id"),
    )
    ecs = ec.select(
        "request_id", hkey("ec", "request_id").alias("ec_id"), F.col("ec.specifics").alias("s")
    ).filter(F.col("s").isNotNull())
    out["ec_specifics"] = ecs.select(
        "request_id",
        "ec_id",
        hkey("ecs", "request_id").alias("ec_specific_id"),
        *[
            F.col(f"s.{c}").alias(c)
            for c in (
                "order_id",
                "retention_deadline",
                "tax_amount",
                "shipping_amount",
                "total_price",
                "total_amount",
            )
        ],
    )
    out["ec_specific_rows"] = ecs.select(
        "request_id",
        hkey("ecs", "request_id").alias("ec_specific_id"),
        F.posexplode("s.rows").alias("row_index", "r"),
    ).select(
        "request_id",
        "ec_specific_id",
        "row_index",
        *[
            F.col(f"r.{c}").alias(c)
            for c in (
                "item_name",
                "item_url",
                "item_id",
                "manufacturer_name",
                "sold_by",
                "fulfilled_by",
                "unit_price",
                "quantity",
                "subtotal",
            )
        ],
    )

    # --- approval_process subtree (N9) ------------------------------------
    ap = d.select(rid, F.col("detail.approval_process").alias("ap")).filter(
        F.col("ap").isNotNull()
    ).transform(_keep)
    ap_id = hkey("ap", "request_id")
    out["approval_process"] = ap.select(
        "request_id",
        ap_id.alias("approval_process_id"),
        F.col("ap.is_route_changed_by_applicant").alias("is_route_changed_by_applicant"),
    )
    out["approval_route_modify_logs"] = ap.select(
        "request_id",
        ap_id.alias("approval_process_id"),
        F.posexplode("ap.approval_route_modify_logs").alias("log_index", "l"),
    ).select(
        "request_id",
        "approval_process_id",
        "log_index",
        F.col("l.date").alias("date"),
        F.col("l.user_name").alias("user_name"),
    )
    steps = (
        ap.select(
            "request_id",
            ap_id.alias("approval_process_id"),
            F.posexplode("ap.steps").alias("step_index", "st"),
        )
        .withColumn(
            "approval_step_id", hkey("st", "approval_process_id", "step_index")
        )
        .transform(_keep)
    )
    out["approval_steps"] = steps.select(
        "request_id",
        "approval_process_id",
        "step_index",
        "approval_step_id",
        F.col("st.name").alias("name"),
        F.col("st.condition").alias("condition"),
        F.col("st.status").alias("status"),
    )
    # approver_code included — the reference's upsert drops it despite the
    # column existing (defect noted in SURVEY.md §4.4); we persist it.
    out["approvers"] = steps.select(
        "request_id",
        "approval_step_id",
        F.posexplode("st.approvers").alias("approver_index", "a"),
    ).select(
        "request_id",
        "approval_step_id",
        "approver_index",
        *[
            F.col(f"a.{c}").alias(c)
            for c in (
                "status",
                "approved_date",
                "approver_name",
                "approver_code",
                "proxy_approver_name",
                "proxy_approver_code",
            )
        ],
    )

    # --- comments: dedup within request + association per scope (N10) -----
    step_comments = steps.select(
        "request_id",
        F.col("approval_step_id"),
        F.lit(False).alias("after_completion"),
        F.posexplode("st.comments").alias("comment_index", "c"),
    )
    ac_comments = ap.select(
        "request_id",
        F.lit(None).cast("long").alias("approval_step_id"),
        F.lit(True).alias("after_completion"),
        F.posexplode("ap.after_completion.comments").alias("comment_index", "c"),
    )
    all_comments = step_comments.unionByName(ac_comments).withColumn(
        "comment_id",
        hkey("cm", "request_id", F.col("c.user_name"), F.col("c.date"), F.col("c.text")),
    ).transform(_keep)
    out["comments"] = (
        all_comments.groupBy("comment_id")
        .agg(
            F.first("request_id").alias("request_id"),
            F.first(F.col("c.user_name"), ignorenulls=True).alias("user_name"),
            F.first(F.col("c.date"), ignorenulls=True).alias("date"),
            F.first(F.col("c.text"), ignorenulls=True).alias("text"),
            F.max(F.col("c.deleted")).alias("deleted"),
        )
    )
    out["comment_associations"] = all_comments.select(
        "request_id", "comment_id", "approval_step_id", "after_completion", "comment_index"
    )

    # --- viewers (N11: JSON key "group" -> column group_name) -------------
    out["viewers"] = d.select(
        rid, F.posexplode("detail.viewers").alias("viewer_index", "v")
    ).select(
        "request_id",
        "viewer_index",
        F.col("v.user_name").alias("user_name"),
        F.col("v.status").alias("status"),
        F.col("v.group").alias("group_name"),
        F.col("v.position").alias("position"),
    )

    # --- modify_logs, 3 levels + dict->list coercion (N12) ----------------
    ml = d.select(
        rid, F.posexplode("detail.modify_logs").alias("log_index", "m")
    ).withColumn("modify_log_id", hkey("ml", "request_id", "log_index")).transform(_keep)
    out["modify_logs"] = ml.select(
        "request_id",
        "log_index",
        "modify_log_id",
        F.col("m.date").alias("date"),
        F.col("m.user_name").alias("user_name"),
    )
    mld = (
        ml.select(
            "request_id", "modify_log_id", F.posexplode("m.detail").alias("log_detail_index", "dt")
        )
        .withColumn(
            "modify_log_detail_id", hkey("mld", "modify_log_id", "log_detail_index")
        )
        .transform(_keep)
    )
    out["modify_log_details"] = mld.select(
        "request_id",
        "modify_log_id",
        "log_detail_index",
        "modify_log_detail_id",
        F.col("dt.title").alias("title"),
        F.col("dt.old").alias("old"),
        F.col("dt.new").alias("new"),
        F.col("dt.log_type").alias("log_type"),
    )
    spec_ddl = "array<struct<status:string,difference:string>>"
    one_ddl = "struct<status:string,difference:string>"
    specifics_arr = F.expr(
        f"case when dt.specifics is null then null"
        f" when schema_of_variant(dt.specifics) like 'ARRAY%'"
        f"  then try_variant_get(dt.specifics, '$', '{spec_ddl}')"
        f" else array(try_variant_get(dt.specifics, '$', '{one_ddl}')) end"
    )
    out["modify_log_detail_specifics"] = mld.select(
        "request_id",
        "modify_log_detail_id",
        F.posexplode(specifics_arr).alias("specific_index", "sp"),
    ).select(
        "request_id",
        "modify_log_detail_id",
        "specific_index",
        F.col("sp.status").alias("status"),
        F.col("sp.difference").alias("difference"),
    )

    # --- files: global dedup + association per scope (N13) ----------------
    def _file_scope(df: DataFrame, files_col: str, parent_type: str, parent_id) -> DataFrame:
        return df.select(
            F.col("request_id"),
            F.lit(parent_type).alias("parent_type"),
            (parent_id if parent_id is not None else F.lit(None).cast("long")).alias(
                "parent_id"
            ),
            F.posexplode(files_col).alias("file_index", "f"),
        )

    file_scopes = [
        _file_scope(ci, "ci.files", PARENT_CUSTOMIZED_ITEM, F.col("customized_item_id")),
        _file_scope(erow, "r.files", PARENT_EXPENSE_ROW, F.col("expense_specific_row_id")),
        _file_scope(prow, "r.files", PARENT_PAYMENT_ROW, F.col("payment_specific_row_id")),
        _file_scope(steps, "st.files", PARENT_APPROVAL_STEP, F.col("approval_step_id")),
        _file_scope(ap, "ap.after_completion.files", PARENT_AFTER_COMPLETION, None),
        _file_scope(
            d.select(rid, F.col("detail.default_attachment_files").alias("daf")),
            "daf",
            PARENT_DEFAULT_ATTACHMENT,
            None,
        ),
    ]
    assoc = file_scopes[0]
    for s in file_scopes[1:]:
        assoc = assoc.unionByName(s)
    assoc = assoc.transform(_keep)

    out["files"] = (
        assoc.groupBy(F.col("f.id").alias("id"))
        .agg(
            *[
                F.first(F.col(f"f.{c}"), ignorenulls=True).alias(c)
                for c in ("name", "type", "user_name", "date")
            ],
            F.max(F.col("f.deleted")).alias("deleted"),
        )
    )
    out["file_associations"] = assoc.filter(
        F.col("parent_type") != PARENT_DEFAULT_ATTACHMENT
    ).select(
        "request_id",
        F.col("f.id").alias("file_id"),
        "parent_type",
        "parent_id",
        "file_index",
    )
    # default attachments: same file may repeat N times -> repeat counter
    # (reference _default_attachment_files.py:24-37).
    out["default_attachment_files"] = (
        assoc.filter(F.col("parent_type") == PARENT_DEFAULT_ATTACHMENT)
        .groupBy("request_id", F.col("f.id").alias("file_id"))
        .agg(F.min("file_index").alias("first_index"), F.count("*").alias("n_repeat"))
    )

    return ShreddedTables(out, cached)

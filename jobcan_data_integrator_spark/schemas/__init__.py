"""Explicit schema catalog for the engine.

The reference declares every table with fixed typed columns and accesses
input JSON by hard-coded key — there is NO schema inference (reference:
database/requests/_table_init.py:48-446, SURVEY.md §1.2).  We mirror that
stance: the nested request-document schema below is declared explicitly and
``from_json`` runs in PERMISSIVE mode, so a missing/mistyped field becomes
NULL (the reference's warn-and-continue semantics) instead of failing the
batch.

Union-typed positions in the source JSON (reference ``_expense.py:76-84``:
``custom_items[].value`` is a string OR an object; ``_modify_logs.py:31-32``:
``specifics`` is an object coerced to a 1-element list) are declared as
``variant`` — Spark 4's native heterogeneous type — and resolved at shred
time.
"""

from __future__ import annotations

# --- shared fragments -------------------------------------------------------

FILE_DDL = (
    "struct<id:string,name:string,type:string,user_name:string,date:string,"
    "deleted:boolean>"
)

COMMENT_DDL = "struct<user_name:string,date:string,text:string,deleted:boolean>"

GENERIC_MASTER_DDL = (
    "struct<record_name:string,record_code:string,additional_items:array<string>>"
)

# --- request detail document (reference: FIXTURES.md §10, accessors in
#     database/requests/*) ---------------------------------------------------

_CUSTOMIZED_ITEM_DDL = (
    "struct<"
    "title:string,content:string,"
    f"generic_master:{GENERIC_MASTER_DDL},"
    f"files:array<{FILE_DDL}>,"
    "table:array<array<struct<"
    f"column_number:bigint,value:string,generic_master:{GENERIC_MASTER_DDL}>>>"
    ">"
)

_CUSTOM_ITEM_DDL = (
    "struct<name:string,item_type:string,value:variant>"
    # value: string OR struct<generic_master_code,generic_master_record_name,
    # generic_master_record_code,content,memo,extension_items:array<{name,value}>>
)

_EXPENSE_ROW_DDL = (
    "struct<"
    "row_number:string,use_date:string,group_name:string,project_name:string,"
    "content_description:string,breakdown:string,amount:bigint,"
    f"custom_items:array<{_CUSTOM_ITEM_DDL}>,"
    f"files:array<{FILE_DDL}>"
    ">"
)

_EXPENSE_DDL = (
    "struct<"
    "amount:bigint,related_request_title:string,related_request_id:string,"
    "use_suspense_payment:boolean,content_description:string,"
    "advanced_payment:bigint,suspense_payment_amount:bigint,"
    f"specifics:array<struct<type:string,rows:array<{_EXPENSE_ROW_DDL}>>>"
    ">"
)

_PAYMENT_ROW_DDL = (
    "struct<"
    "company_name:string,zip_code:string,address:string,"
    "bank_name:string,bank_name_kana:string,bank_account_name_kana:string,"
    "bank_code:bigint,branch_code:bigint,"
    "row_number:string,use_date:string,group_name:string,project_name:string,"
    "content_description:string,breakdown:string,amount:bigint,"
    f"files:array<{FILE_DDL}>"
    ">"
)

_PAYMENT_DDL = (
    "struct<"
    "amount:bigint,related_request_title:string,related_request_id:string,"
    "content_description:string,"
    f"specifics:array<struct<type:string,rows:array<{_PAYMENT_ROW_DDL}>>>"
    ">"
)

_SHIPPING_ADDRESS_DDL = (
    "struct<shipping_address_name:string,zip_code:string,country:string,"
    "state:string,city:string,address1:string,address2:string,"
    "company_name:string,contact_name:string,tel:string,email:string>"
)

_EC_DDL = (
    "struct<"
    "related_request_id:string,related_request_title:string,"
    "content_description:string,billing_destination:string,"
    f"shipping_address:{_SHIPPING_ADDRESS_DDL},"
    "specifics:struct<"
    "order_id:string,retention_deadline:string,tax_amount:bigint,"
    "shipping_amount:bigint,total_price:bigint,total_amount:bigint,"
    "rows:array<struct<item_name:string,item_url:string,item_id:string,"
    "manufacturer_name:string,sold_by:string,fulfilled_by:string,"
    "unit_price:bigint,quantity:string,subtotal:bigint>>"
    ">"
    ">"
)

_APPROVAL_PROCESS_DDL = (
    "struct<"
    "is_route_changed_by_applicant:boolean,"
    "approval_route_modify_logs:array<struct<date:string,user_name:string>>,"
    "steps:array<struct<"
    "name:string,condition:string,status:string,"
    "approvers:array<struct<status:string,approved_date:string,"
    "approver_name:string,approver_code:string,proxy_approver_name:string,"
    "proxy_approver_code:string>>,"
    f"comments:array<{COMMENT_DDL}>,"
    f"files:array<{FILE_DDL}>"
    ">>,"
    f"after_completion:struct<comments:array<{COMMENT_DDL}>,files:array<{FILE_DDL}>>"
    ">"
)

_MODIFY_LOG_DDL = (
    "struct<date:string,user_name:string,"
    "detail:array<struct<title:string,old:string,new:string,log_type:string,"
    "specifics:variant>>>"
    # specifics: array<struct<status,difference>> OR a bare struct (coerced to
    # a 1-element list, reference _modify_logs.py:31-32)
)

_VIEWER_DDL = "struct<user_name:string,status:string,group:string,position:string>"

DETAIL_DDL = (
    "struct<"
    f"customized_items:array<{_CUSTOMIZED_ITEM_DDL}>,"
    f"expense:{_EXPENSE_DDL},"
    f"payment:{_PAYMENT_DDL},"
    f"ec:{_EC_DDL},"
    f"approval_process:{_APPROVAL_PROCESS_DDL},"
    f"viewers:array<{_VIEWER_DDL}>,"
    f"modify_logs:array<{_MODIFY_LOG_DDL}>,"
    f"default_attachment_files:array<{FILE_DDL}>"
    ">"
)

#: Full request document, as returned by /v1/requests/{id}
#: (reference header fields: database/requests/_requests.py:72-92).
REQUEST_DOC_DDL = (
    "struct<"
    "id:string,title:string,status:string,"
    "form_id:bigint,form_name:string,form_type:string,settlement_type:string,"
    "applied_date:string,applicant_code:string,applicant_last_name:string,"
    "applicant_first_name:string,applicant_group_name:string,"
    "applicant_group_code:string,applicant_position_name:string,"
    "proxy_applicant_last_name:string,proxy_applicant_first_name:string,"
    "group_name:string,group_code:string,project_name:string,"
    "project_code:string,flow_step_name:string,is_content_changed:boolean,"
    "total_amount:bigint,pay_at:string,final_approval_period:string,"
    "final_approved_date:string,"
    f"detail:{DETAIL_DDL}"
    ">"
)

# --- basic entities (one API each; reference accessors cited) ---------------

USER_DDL = (  # database/users.py:101-180
    "struct<id:bigint,user_code:string,email:string,last_name:string,"
    "first_name:string,is_approver:boolean,user_role:bigint,memo:string,"
    "user_groups:array<string>,"
    "user_positions:array<struct<position_code:string,group_code:string>>,"
    "user_bank_account:struct<bank_code:string,bank_name:string,"
    "bank_name_kana:string,branch_code:string,branch_name:string,"
    "branch_name_kana:string,bank_account_type_code:string,"
    "bank_account_code:string,bank_account_name_kana:string>>"
)

GROUP_DDL = (  # database/group.py:52-64
    "struct<group_code:string,group_name:string,parent_group_code:string,"
    "description:string>"
)

POSITION_DDL = "struct<position_code:string,position_name:string,description:string>"

PROJECT_DDL = "struct<project_code:string,project_name:string>"

COMPANY_DDL = (  # database/company.py:58-69
    "struct<company_code:string,company_name:string,zip_code:string,"
    "address:string,bank_code:string,bank_name:string,branch_code:string,"
    "branch_name:string,bank_account_type_code:string,bank_account_code:string,"
    "bank_account_name_kana:string,invoice_registrated_number:string>"
)

FORM_DDL = (  # database/forms.py:55-61
    "struct<id:bigint,category:string,form_type:string,settlement_type:string,"
    "name:string,view_type:string,description:string>"
)

FIX_JOURNAL_DDL = (  # database/fix_journal.py:97-133
    "struct<journal_id:bigint,journal_type:string,journal_date:string,"
    "req_date:string,journal_summary:string,view_id:string,"
    "specifics_row_number:bigint,company_code:string,company_name:string,"
    "user_code:string,user_name:string,"
    + ",".join(
        f"{side}_{c}:string"
        for side in ("debit", "credit")
        for c in (
            "account_title_code",
            "account_title_name",
            "account_sub_title_code",
            "account_sub_title_name",
            "tax_category_code",
            "tax_category_name",
        )
    )
    + ","
    + ",".join(
        f"{side}_{c}:bigint"
        for side in ("debit", "credit")
        for c in ("amount", "tax_amount", "amount_without_tax")
    )
    + ","
    + ",".join(
        f"{side}_{c}:string"
        for side in ("debit", "credit")
        for c in (
            "group_code",
            "group_name",
            "accounting_group_code",
            "project_code",
            "project_name",
        )
    )
    + ",invoice_registrated_number:string,"
    "custom_journal_item_list:array<struct<key:string,value:string,"
    "generic_master_record_code:string>>>"
)

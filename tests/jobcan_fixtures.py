"""Deterministic synthetic Jobcan-shaped fixtures (FIXTURES.md shapes).

Covers the required edge cases: every detail subtree present AND null,
shared file ids across scopes, repeated default attachments, duplicate
comments across step/after_completion (incl. NULL text), shared
shipping_address across requests, union-typed custom_items.value
(string | object), dict-coerced modify_log specifics, all six statuses,
Japanese text, and '123,456 円' shaped contents.
"""

from __future__ import annotations

import json
import random
from typing import Any

#: the six form ids hard-coded in the reference views (FIXTURES.md §7).
FORM_POOL = [54142953, 41052205, 75858728, 11171823, 9782279, 29608169]

STATUSES = [
    "in_progress",
    "completed",
    "rejected",
    "canceled",
    "returned",
    "canceled_after_completion",
]

_SHARED_SHIPPING = {
    "shipping_address_name": "本社倉庫",
    "zip_code": "100-0001",
    "country": "日本",
    "state": "東京都",
    "city": "千代田区",
    "address1": "丸の内1-1-1",
    "address2": "10F",
    "company_name": "株式会社テスト",
    "contact_name": "山田太郎",
    "tel": "03-1234-5678",
    "email": "test@example.co.jp",
}


def _file(i: int, rng: random.Random) -> dict[str, Any]:
    # attrs derived from the id: the file registry dedups by id globally
    # (reference _data_class.py:13-143), so a given id must carry stable
    # metadata across documents.
    return {
        "id": f"file-{i}",
        "name": f"領収書_{i}.pdf",
        "type": "application/pdf",
        "user_name": f"user{i % 5}",
        "date": f"2024/0{1 + i % 9}/15 10:00:00",
        "deleted": i % 10 == 3,
    }


def _comment(i: int, text: str | None) -> dict[str, Any]:
    return {
        "user_name": f"承認者{i}",
        "date": f"2024/03/0{1 + i % 9} 09:30:00",
        "text": text,
        "deleted": False,
    }


def _generic_master(i: int) -> dict[str, Any]:
    return {
        "record_name": f"マスタ{i}",
        "record_code": f"GM{i:03d}",
        "additional_items": [f"追加{i}", f"属性{i}"],
    }


def make_request_doc(n: int, rng: random.Random) -> dict[str, Any]:
    """One request document; subtree presence varies deterministically."""
    status = STATUSES[n % len(STATUSES)]
    shared_file = _file(1000 + n % 3, rng)  # shared across scopes/requests
    doc: dict[str, Any] = {
        "id": f"sa-{n}",
        "title": f"経費精算 第{n}号",
        "status": status,
        "form_id": FORM_POOL[n % len(FORM_POOL)],
        "form_name": f"書式{n % 5}",
        "form_type": "expense",
        "settlement_type": "transfer",
        "applied_date": f"2024-03-{1 + n % 27:02d} 10:00:00",
        "applicant_code": f"EMP{n % 7:04d}",
        "applicant_last_name": "田中",
        "applicant_first_name": f"太郎{n}",
        "applicant_group_name": f"営業部{n % 3}",
        "applicant_group_code": f"G{n % 3:03d}",
        "applicant_position_name": "主任",
        "proxy_applicant_last_name": None if n % 2 else "佐藤",
        "proxy_applicant_first_name": None if n % 2 else "花子",
        "group_name": f"営業部{n % 3}",
        "group_code": f"G{n % 3:03d}",
        "project_name": f"PJ{n % 4}" if n % 5 else None,
        "project_code": f"P{n % 4:03d}" if n % 5 else None,
        "flow_step_name": "部長承認" if n % 2 else None,
        "is_content_changed": n % 4 == 0,
        "total_amount": 123456 + n * 1000,
        "pay_at": f"2024-04-{1 + n % 27:02d}",
        "final_approval_period": None,
        "final_approved_date": f"2024-03-{1 + n % 27:02d} 18:00:00"
        if status == "completed"
        else None,
        "detail": {},
    }
    detail: dict[str, Any] = {}

    if n % 4 != 3:  # customized_items with 2-D table + generic_master
        detail["customized_items"] = [
            {
                "title": "金額欄",
                "content": f"{123456 + n:,} 円".replace(",", ","),
                "generic_master": _generic_master(n % 4) if n % 2 == 0 else None,
                "files": [shared_file] if n % 3 == 0 else None,
                "table": [
                    [
                        {
                            "column_number": c,
                            "value": f"セル{r}-{c}",
                            "generic_master": _generic_master(99) if (r + c) % 3 == 0 else None,
                        }
                        for c in range(2)
                    ]
                    for r in range(2)
                ]
                if n % 3 == 0
                else None,
            },
            {"title": "日付欄", "content": f"2024/03/{1 + n % 27:02d}"},
            {"title": "备考", "content": "出張旅費（新幹線・のぞみ）"},
        ]

    if n % 3 != 2:  # expense subtree with union-typed custom item values
        rows = []
        for r in range(1 + n % 3):
            custom_items: list[dict[str, Any]] = [
                {"name": "区分", "item_type": "select", "value": f"交通費{r}"},
            ]
            if r % 2 == 0:
                custom_items.append(
                    {
                        "name": "マスタ参照",
                        "item_type": "generic_master",
                        "value": {
                            "generic_master_code": f"C{r:02d}",
                            "generic_master_record_name": "新幹線",
                            "generic_master_record_code": f"R{r:02d}",
                            "content": "東京-大阪",
                            "memo": "のぞみ指定席" if r == 0 else None,
                            "extension_items": [
                                {"name": "路線", "value": "東海道"},
                                {"name": "クラス", "value": "普通車"},
                            ]
                            if r == 0
                            else None,
                        },
                    }
                )
            rows.append(
                {
                    "row_number": str(r + 1),
                    "use_date": f"2024/03/{1 + r:02d}",
                    "group_name": f"営業部{r}",
                    "project_name": None,
                    "content_description": f"移動 {r}",
                    "breakdown": "電車",
                    "amount": 14000 + r * 100,
                    "custom_items": custom_items,
                    "files": [shared_file, _file(2000 + n, rng)] if r == 0 and n % 2 == 0 else None,
                }
            )
        detail["expense"] = {
            "amount": 123456 + n * 1000,
            "related_request_title": f"関連申請{n}" if n % 3 == 0 else None,
            "related_request_id": f"sa-{n - 1}" if n % 3 == 0 and n > 0 else None,
            **({"use_suspense_payment": n % 2 == 0} if n % 5 != 1 else {}),
            **({"content_description": "3月出張費"} if n % 5 != 1 else {}),
            "advanced_payment": 5000 if n % 4 == 0 else None,
            "suspense_payment_amount": None,
            "specifics": [
                {"type": f"タイプ{t}", "rows": rows if t == 0 else rows[:1]}
                for t in range(1 + n % 2)
            ],
        }

    if n % 5 == 0:  # payment subtree
        detail["payment"] = {
            "amount": 50000 + n,
            "related_request_title": None,
            "related_request_id": None,
            "content_description": "支払依頼",
            "specifics": [
                {
                    "type": "振込",
                    "rows": [
                        {
                            "company_name": "株式会社サプライ",
                            "zip_code": "150-0001",
                            "address": "渋谷区神宮前1-1",
                            "bank_name": "みずほ銀行",
                            "bank_name_kana": "ミズホギンコウ",
                            "bank_account_name_kana": "カ）サプライ",
                            "bank_code": 1,
                            "branch_code": 123,
                            "row_number": "1",
                            "use_date": "2024/03/10",
                            "group_name": "調達部",
                            "project_name": "PJ1",
                            "content_description": "部品代",
                            "breakdown": None,
                            "amount": 50000 + n,
                            "files": [_file(3000 + n, rng)],
                        }
                    ],
                }
            ],
        }

    if n % 4 == 1:  # ec subtree with shared shipping address
        detail["ec"] = {
            "related_request_id": None,
            "related_request_title": None,
            "content_description": "備品購入",
            "billing_destination": "本社",
            "shipping_address": dict(_SHARED_SHIPPING),
            "specifics": {
                "order_id": f"ORD-{n:06d}",
                "retention_deadline": "2024/12/31",
                "tax_amount": 800,
                "shipping_amount": 500,
                "total_price": 8000,
                "total_amount": 9300,
                "rows": [
                    {
                        "item_name": f"モニター{i}",
                        "item_url": f"https://ec.example.com/item/{i}",
                        "item_id": f"ITEM{i}",
                        "manufacturer_name": "メーカーA",
                        "sold_by": "EC本店",
                        "fulfilled_by": "EC物流",
                        "unit_price": 4000,
                        "quantity": str(1 + i),
                        "subtotal": 4000 * (1 + i),
                    }
                    for i in range(2)
                ],
            },
        }

    if n % 3 != 1:  # approval process with dup comments + step files
        dup_comment = _comment(0, "承認します" if n % 2 == 0 else None)
        detail["approval_process"] = {
            "is_route_changed_by_applicant": n % 2 == 0,
            "approval_route_modify_logs": [
                {"date": "2024/03/02 10:00:00", "user_name": "管理者"}
            ]
            if n % 4 == 0
            else None,
            "steps": [
                {
                    "name": f"ステップ{s}",
                    "condition": "全員承認" if s == 0 else None,
                    "status": "承認済み" if s == 0 else "進行中",
                    "approvers": [
                        {
                            "status": "承認済み" if (s + a) % 2 == 0 else "未承認",
                            "approved_date": f"2024-03-0{3 + a} 14:0{a}:00"
                            if (s + a) % 2 == 0
                            else None,
                            "approver_name": f"承認者{a}",
                            "approver_code": f"APP{a:03d}",
                            "proxy_approver_name": None,
                            "proxy_approver_code": None,
                        }
                        for a in range(1 + s)
                    ],
                    "comments": [dup_comment, _comment(s + 1, f"コメント{s}")]
                    if s == 0
                    else None,
                    "files": [shared_file] if s == 0 and n % 4 == 0 else None,
                }
                for s in range(1 + n % 3)
            ],
            "after_completion": {
                "comments": [dup_comment],  # duplicate across scopes
                "files": [_file(4000 + n, rng)],
            }
            if n % 2 == 0
            else None,
        }

    if n % 2 == 0:
        detail["viewers"] = [
            {
                "user_name": f"閲覧者{v}",
                "status": "既読" if v % 2 == 0 else "未読",
                "group": f"部門{v}" if v % 2 == 0 else None,
                "position": "課長" if v == 0 else None,
            }
            for v in range(2)
        ]

    if n % 3 == 0:  # modify_logs incl. dict-coerced specifics
        detail["modify_logs"] = [
            {
                "date": "2024/03/05 11:00:00",
                "user_name": "田中太郎",
                "detail": [
                    {
                        "title": "金額",
                        "old": "10,000 円",
                        "new": "12,000 円",
                        "log_type": "update",
                        # list variant
                        "specifics": [
                            {"status": "changed", "difference": "+2000"},
                            {"status": "noted", "difference": "承認前修正"},
                        ],
                    },
                    {
                        "title": "日付",
                        "old": None,
                        "new": "2024/03/06",
                        "log_type": "add",
                        # dict variant — reference coerces to [dict]
                        "specifics": {"status": "added", "difference": "新規"},
                    },
                ],
            }
        ]

    if n % 4 == 0:  # repeated default attachments (same id 2-3x)
        repeats = 2 + n % 2
        detail["default_attachment_files"] = [shared_file] * repeats + [
            _file(5000 + n, rng)
        ]

    doc["detail"] = detail
    return doc


def make_request_docs(count: int = 24, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    return [json.dumps(make_request_doc(i, rng), ensure_ascii=False) for i in range(count)]


# ---------------------------------------------------------------------------
# basic entities (the 7 non-request APIs) — keyed to line up with the request
# fixtures: applicant_code EMP0000-EMP0006, group codes G000-G002, the six
# FORM_POOL ids, fix_journals.view_id = "sa-N", and company_name matching the
# companies table (the J9 join in 書式4-1/4-2).
# ---------------------------------------------------------------------------

_COMPANY_NAMES = ["株式会社サプライ", "有限会社パーツ", "合同会社ロジ"]


def _user(i: int) -> dict[str, Any]:
    bank = (
        None
        if i % 3 == 2
        else {
            "bank_code": f"{1 + i:04d}",
            "bank_name": "みずほ銀行" if i % 2 == 0 else "三井住友銀行",
            "bank_name_kana": "ミズホ" if i % 2 == 0 else "ミツイスミトモ",
            "branch_code": f"{100 + i}",
            "branch_name": f"支店{i}",
            "branch_name_kana": f"シテン{i}",
            "bank_account_type_code": str(1 + i % 2),
            "bank_account_code": f"{7000000 + i}",
            "bank_account_name_kana": f"タナカ タロウ{i}",
        }
    )
    return {
        "id": 100 + i,
        "user_code": f"EMP{i:04d}",
        "email": f"emp{i}@example.co.jp",
        "last_name": "田中",
        "first_name": f"太郎{i}",
        "is_approver": i % 2 == 0,
        "user_role": i % 3,
        "memo": "" if i % 4 == 0 else f"メモ{i}",
        "user_groups": [f"G{g:03d}" for g in range(1 + i % 3)],
        "user_positions": [
            {
                "position_code": f"POS{i % 2}",
                "group_code": f"G{i % 3:03d}" if i % 4 != 1 else None,
            }
        ],
        "user_bank_account": bank,
    }


def _company(i: int) -> dict[str, Any]:
    return {
        "company_code": f"C{i:04d}",
        "company_name": _COMPANY_NAMES[i % len(_COMPANY_NAMES)] if i < 3 else f"取引先{i}",
        "zip_code": "100-0001",
        "address": f"東京都千代田区{i}",
        "bank_code": "" if i % 4 == 3 else f"{i:04d}",  # '' -> NULL coercion path
        "bank_name": "みずほ銀行",
        "branch_code": "" if i % 4 == 3 else f"{200 + i}",
        "branch_name": f"支店{i}",
        "bank_account_type_code": ["1", "2", "9", "", "7"][i % 5],  # decode + passthrough
        "bank_account_code": f"{8000000 + i}",
        "bank_account_name_kana": f"カ）トリヒキサキ{i}",
        "invoice_registrated_number": f"T{i:013d}" if i % 2 == 0 else None,
    }


def _fix_journal(jid: int, view_n: int, jtype: str) -> dict[str, Any]:
    return {
        "journal_id": jid,
        "journal_type": jtype,
        "journal_date": f"2024/03/{1 + view_n % 27:02d}",
        "req_date": f"2024/03/{1 + view_n % 27:02d}",
        "journal_summary": f"仕訳{jid}",
        "view_id": f"sa-{view_n}",
        "specifics_row_number": jid % 3,
        "company_code": f"C{view_n % 4:04d}",
        "company_name": _COMPANY_NAMES[view_n % len(_COMPANY_NAMES)],
        "user_code": f"EMP{view_n % 7:04d}",
        "user_name": f"田中太郎{view_n % 7}",
        "debit_account_title_code": "5101",
        "debit_account_title_name": "旅費交通費",
        "debit_amount": 10000 + jid,
        "debit_tax_amount": 1000,
        "debit_amount_without_tax": 9000 + jid,
        "credit_account_title_code": "2101",
        "credit_account_title_name": "未払金",
        "credit_amount": 10000 + jid,
        "credit_tax_amount": 1000,
        "credit_amount_without_tax": 9000 + jid,
        "debit_group_code": f"G{view_n % 3:03d}",
        "debit_group_name": f"営業部{view_n % 3}",
        "invoice_registrated_number": f"T{jid:013d}" if jid % 2 == 0 else None,
        "custom_journal_item_list": [
            {"key": "部門", "value": f"営業部{view_n % 3}", "generic_master_record_code": None},
            {"key": "案件", "value": f"PJ{view_n % 4}", "generic_master_record_code": f"R{jid:02d}"},
        ]
        if jid % 3 != 2
        else None,
    }


def make_entities(n_requests: int = 24) -> dict[str, list[str]]:
    """Raw JSON pages for the 7 basic-entity APIs (one string per record)."""
    ents: dict[str, list[dict[str, Any]]] = {
        "users": [_user(i) for i in range(7)],
        "groups": [
            {
                "group_code": f"G{g:03d}",
                "group_name": f"営業部{g}",
                "parent_group_code": "G000" if g else None,
                "description": f"グループ{g}" if g % 2 else None,
            }
            for g in range(3)
        ],
        "positions": [
            {
                "position_code": f"POS{p}",
                "position_name": ["主任", "課長"][p],
                "description": None,
            }
            for p in range(2)
        ],
        "projects": [
            {"project_code": f"P{p:03d}", "project_name": f"PJ{p}"} for p in range(4)
        ],
        "companies": [_company(i) for i in range(6)],
        "forms": [
            {
                "id": fid,
                "category": "支払",
                "form_type": "expense" if k % 2 == 0 else "payment",
                "settlement_type": "transfer",
                "name": f"書式{k}",
                "view_type": "standard",
                "description": None,
            }
            for k, fid in enumerate(FORM_POOL)
        ],
        "fix_journals": [
            _fix_journal(2 * n + (0 if t == "book" else 1), n, t)
            for n in range(0, n_requests, 2)
            for t in ("book", "pay")
        ],
    }
    return {
        api: [json.dumps(e, ensure_ascii=False) for e in records]
        for api, records in ents.items()
    }


# ---------------------------------------------------------------------------
# canonicalization for round-trip comparison
# ---------------------------------------------------------------------------


def canonicalize(obj: Any) -> Any:
    """Drop nulls and empty arrays/objects recursively; sort keys.

    to_json omits null struct fields and the shred pipeline stores no rows
    for empty arrays, so both sides normalize to this form.  Empty
    elements inside lists are dropped too: positional row-shredding
    cannot represent a childless inner collection (e.g. a 2-D table row
    with zero cells), the same representational loss the reference's
    (parent_id, index) row encoding has — reconstruction collapses the
    gap, so the canonical form does as well.

    ``default_attachment_files`` is compared as a MULTISET: both this
    engine and the reference store default attachments as one association
    row per file with a repeat COUNT (reference
    _default_attachment_files.py:24-37 and its row-repeating CTE
    :59-86), so an input that interleaves duplicates, e.g.
    [f-3, f-1, f-3], is unrepresentable and reconstructs with the
    repeats adjacent — the counts, not the interleaving, are the
    contract.
    """
    if isinstance(obj, dict):
        out = {k: canonicalize(v) for k, v in sorted(obj.items())}
        out = {k: v for k, v in out.items() if v not in (None, [], {})}
        if isinstance(out.get("default_attachment_files"), list):
            out["default_attachment_files"] = sorted(
                out["default_attachment_files"],
                key=lambda e: json.dumps(e, sort_keys=True, ensure_ascii=False),
            )
        return out
    if isinstance(obj, list):
        out_l = [canonicalize(v) for v in obj]
        return [v for v in out_l if v not in (None, [], {})]
    return obj

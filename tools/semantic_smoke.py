"""Semantic retrieval smoke test — meaningful only with REAL weights.

Run by the network-gated CI leg (.github/workflows/net-eval.yml) after
``zebra-tpu fetch-weights all``: related sentences must out-rank unrelated
ones through the full facade path (embed -> insert -> query), which random
-init weights cannot do. Offline (no weights), prints the degradation
status and exits 0 — the assertion only arms when the model reports
``semantic: true`` (models/text.py:289-310), so the script is safe to run
anywhere but proves semantics exactly where the weights exist.

Reference behaviour matched: first-use model download + semantic query
(``model/text.rs:15-17``, ``core.rs:267-277``).
"""

import sys
import tempfile

sys.path.insert(0, ".")

CORPUS = [
    b"The chef seasoned the soup with fresh basil and thyme.",
    b"A recipe for slow-cooked lamb stew with root vegetables.",
    b"Quarterly earnings beat analyst expectations by a wide margin.",
    b"The central bank held interest rates steady this quarter.",
    b"The goalkeeper saved a penalty in the final minute.",
    b"A midfielder scored twice as the home team won the derby.",
]
QUERIES = [
    (b"cooking dinner with herbs", {0, 1}),
    (b"stock market and monetary policy", {2, 3}),
    (b"football match result", {4, 5}),
]


def main() -> int:
    from zebra_tpu.config import DatabaseConfig
    from zebra_tpu.db import Database

    with tempfile.TemporaryDirectory() as td:
        db = Database.create(
            f"{td}/sem.zebra",
            DatabaseConfig(dim=384, metric="sql2", model="bge-small-en-v1.5"),
        )
        status = db.model.status()
        print(f"model status: {status}")
        ids = db.insert_documents(CORPUS)
        id_to_row = {i: r for r, i in enumerate(ids)}
        failures = []
        for q, want in QUERIES:
            res = db.query_documents([q], number_of_results=2)
            got = {id_to_row[i] for i in res[0]}
            print(f"query {q!r}: rows {sorted(got)} (want {sorted(want)})")
            if got != want:
                failures.append((q, got, want))
        db.close()
    if not status.get("semantic"):
        print("weights degraded (offline) — semantic assertion NOT armed; "
              "run `zebra-tpu fetch-weights all` on a connected machine")
        return 0
    if failures:
        print(f"SEMANTIC SMOKE FAILED: {failures}")
        return 1
    print("semantic smoke OK: every query retrieved its topic pair")
    return 0


if __name__ == "__main__":
    sys.exit(main())

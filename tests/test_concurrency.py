"""Concurrent multi-reader/multi-writer access (SURVEY.md §4 (4); reference
claims full thread safety via rayon/DashMap, README.md:9,15)."""

import threading

import numpy as np
import pytest

from zebra_tpu.config import DatabaseConfig, IndexOptions
from zebra_tpu.db import Database


def test_concurrent_insert_query_remove(tmp_path, rng):
    cfg = DatabaseConfig(dim=24, metric="cosine", model="hash-24",
                         index=IndexOptions(num_tables=6, seed=0))
    db = Database.create(str(tmp_path / "c.zebra"), cfg)
    seed_docs = [f"seed {i}".encode() for i in range(50)]
    db.insert_documents(seed_docs)

    errors: list[Exception] = []
    inserted_ids: list[bytes] = []
    lock = threading.Lock()

    def writer(t):
        try:
            for i in range(5):
                ids = db.insert_documents([f"w{t}-{i}-{j}".encode() for j in range(20)])
                with lock:
                    inserted_ids.extend(ids)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader(t):
        try:
            for i in range(10):
                res = db.query_documents([seed_docs[i % 50]], 3)
                assert isinstance(res, dict)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    removed_ids: list[bytes] = []

    def remover():
        try:
            for _ in range(5):
                with lock:
                    victims = inserted_ids[:10]
                    del inserted_ids[:10]
                if victims:
                    db.remove(victims)
                    with lock:
                        removed_ids.extend(victims)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = (
        [threading.Thread(target=writer, args=(t,)) for t in range(3)]
        + [threading.Thread(target=reader, args=(t,)) for t in range(3)]
        + [threading.Thread(target=remover)]
    )
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    # db is consistent: counts add up and queries still work
    assert len(db) == 50 + 300 - len(removed_ids)
    res = db.query_documents([seed_docs[0]], 5)
    assert seed_docs[0] in res[0].values()

"""Index: a set of immutable segments + schema, in RAM or on disk.

TPU-native analog of tantivy's Index/meta.json (SURVEY.md §2.2 T2/T10).
`create_in_ram` is the test fixture path (the reference's RAM-directory
equivalent, SURVEY.md §4); `create`/`open` persist segments to a directory —
the engine's checkpoint/resume story (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from ..schema import Schema
from .segment import Segment, read_segment, write_segment


class Index:
    def __init__(self, schema: Schema, path: Optional[str] = None):
        self.schema = schema
        self.path = path
        self.segments: List[Segment] = []
        #: bumped whenever segment data changes; device loaders key on it
        self.epoch = 0

    # -- constructors ---------------------------------------------------------

    @staticmethod
    def create_in_ram(schema: Schema) -> "Index":
        return Index(schema, path=None)

    @staticmethod
    def create(path: str, schema: Schema, overwrite: bool = False) -> "Index":
        if os.path.exists(path):
            if overwrite:
                shutil.rmtree(path)
            elif os.listdir(path):
                raise FileExistsError(f"{path} exists and is non-empty")
        os.makedirs(path, exist_ok=True)
        idx = Index(schema, path=path)
        idx._commit_meta()
        return idx

    @staticmethod
    def open(path: str) -> "Index":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        schema = Schema.from_json(meta["schema"])
        idx = Index(schema, path=path)
        for seg_id in meta["segments"]:
            idx.segments.append(
                read_segment(os.path.join(path, f"seg_{seg_id}"), schema))
        return idx

    # -- API ------------------------------------------------------------------

    def writer(self):
        from .writer import IndexWriter
        return IndexWriter(self)

    def searcher(self, **kwargs):
        from ..searcher import Searcher
        return Searcher(self, **kwargs)

    def oracle_searcher(self):
        from ..oracle.engine import OracleSearcher
        return OracleSearcher(self)

    @property
    def max_doc_total(self) -> int:
        return sum(s.max_doc for s in self.segments)

    # -- internal hooks used by IndexWriter ------------------------------------

    def _add_segment(self, seg: Segment) -> None:
        self.segments.append(seg)
        self.epoch += 1
        if self.path is not None:
            write_segment(seg, self.schema, os.path.join(self.path, f"seg_{seg.id}"))

    def _segment_mutated(self, seg: Segment) -> None:
        self.epoch += 1
        if self.path is not None:
            write_segment(seg, self.schema, os.path.join(self.path, f"seg_{seg.id}"))

    def _commit_meta(self) -> None:
        self.epoch += 1
        if self.path is None:
            return
        meta = {"schema": self.schema.to_json(),
                "segments": [s.id for s in self.segments]}
        tmp = os.path.join(self.path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.path, "meta.json"))

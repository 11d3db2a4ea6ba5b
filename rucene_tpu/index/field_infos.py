"""Per-field schema registry (reference: rucene src/core/codec/field_infos/,
FieldInfo/FieldInfos/FieldNumbers at field_infos/mod.rs:1038-file).

Field numbers are global across segments of one index so device tensors can
index norms/doc-values by a stable field id.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from rucene_tpu.doc.field import DocValuesType, IndexOptions


@dataclass
class FieldInfo:
    name: str
    number: int
    index_options: IndexOptions = IndexOptions.NONE
    doc_values_type: DocValuesType = DocValuesType.NONE
    omit_norms: bool = False
    store_term_vectors: bool = False
    point_dimension_count: int = 0
    point_num_bytes: int = 0

    def update(self, other: "FieldInfo") -> None:
        """Widen this info with another segment's view of the same field."""
        if other.index_options > self.index_options:
            self.index_options = other.index_options
        if other.doc_values_type != DocValuesType.NONE:
            if (
                self.doc_values_type != DocValuesType.NONE
                and self.doc_values_type != other.doc_values_type
            ):
                raise ValueError(
                    f"field '{self.name}': conflicting doc-values types "
                    f"{self.doc_values_type} vs {other.doc_values_type}"
                )
            self.doc_values_type = other.doc_values_type
        self.omit_norms = self.omit_norms or other.omit_norms
        self.store_term_vectors = self.store_term_vectors or other.store_term_vectors
        if other.point_dimension_count:
            self.point_dimension_count = other.point_dimension_count
            self.point_num_bytes = other.point_num_bytes


@dataclass
class FieldInfos:
    by_name: dict[str, FieldInfo] = dc_field(default_factory=dict)

    def get_or_add(self, name: str) -> FieldInfo:
        info = self.by_name.get(name)
        if info is None:
            info = FieldInfo(name=name, number=len(self.by_name))
            self.by_name[name] = info
        return info

    def get(self, name: str) -> FieldInfo | None:
        return self.by_name.get(name)

    def __iter__(self):
        return iter(sorted(self.by_name.values(), key=lambda f: f.number))

    def __len__(self) -> int:
        return len(self.by_name)

    def max_number(self) -> int:
        return max((f.number for f in self.by_name.values()), default=-1)

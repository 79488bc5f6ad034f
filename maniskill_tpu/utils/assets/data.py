"""Asset registry (counterpart of mani_skill/utils/assets/data.py:13-232).

Registry of downloadable asset sources keyed by id, plus per-env DATA_GROUPS.
This environment has no egress; the registry records metadata so env specs can
check asset presence and emit actionable errors (download happens via
``python -m maniskill_tpu.utils.download_asset`` when networked).
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, List, Optional

ASSET_DIR = Path(
    os.environ.get("MS_ASSET_DIR", os.path.expanduser("~/.maniskill_tpu/data"))
)


@dataclasses.dataclass
class DataSource:
    source_type: str
    url: Optional[str] = None
    hf_repo_id: Optional[str] = None
    github_url: Optional[str] = None
    target_path: Optional[str] = None
    checksum: Optional[str] = None
    zip_dirname: Optional[str] = None
    filename: Optional[str] = None
    output_dir: Path = ASSET_DIR

    @property
    def path(self) -> Path:
        return self.output_dir / (self.target_path or "")

    def is_downloaded(self) -> bool:
        return self.path.exists()


DATA_SOURCES: Dict[str, DataSource] = {}
DATA_GROUPS: Dict[str, List[str]] = {}


def register_data_source(uid: str, **kwargs) -> DataSource:
    src = DataSource(**kwargs)
    DATA_SOURCES[uid] = src
    return src


# mirrors the reference's registry entries (assets/data.py) that our tasks
# will consume as mesh-based features land; procedural tasks need none
register_data_source(
    "ycb", source_type="task_assets",
    url="https://huggingface.co/datasets/haosulab/ManiSkill2/resolve/main/data/mani_skill2_ycb.zip",
    target_path="assets/mani_skill2_ycb",
)
register_data_source(
    "partnet_mobility_cabinet", source_type="task_assets",
    url="https://huggingface.co/datasets/haosulab/ManiSkill/resolve/main/partnet_mobility_cabinet.zip",
    target_path="assets/partnet_mobility/cabinet",
)
register_data_source(
    "ReplicaCAD", source_type="scene",
    hf_repo_id="haosulab/ReplicaCAD",
    target_path="scene_datasets/replica_cad_dataset",
)
register_data_source(
    "AI2THOR", source_type="scene",
    hf_repo_id="haosulab/AI2THOR",
    target_path="scene_datasets/ai2thor",
)
register_data_source(
    "RoboCasa", source_type="scene",
    hf_repo_id="haosulab/RoboCasa",
    target_path="scene_datasets/robocasa_dataset",
)

DATA_GROUPS.update(
    {
        "PickSingleYCB-v1": ["ycb"],
        "PickClutterYCB-v1": ["ycb"],
        "OpenCabinetDrawerMesh-v1": ["partnet_mobility_cabinet"],
        "SceneManipulation-v1": ["ReplicaCAD"],
        "RoboCasaKitchen-v1": ["RoboCasa"],
    }
)


def is_data_group_downloaded(group: str) -> bool:
    return all(
        DATA_SOURCES[uid].is_downloaded() for uid in DATA_GROUPS.get(group, [])
    )


def expected_assets_for_env(env_id: str) -> List[str]:
    return DATA_GROUPS.get(env_id, [])

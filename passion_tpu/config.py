"""Configuration: the reference's argparse surface (code/options.py) backed
by a dataclass.

Flag names are the public API (`--model --mask_type --use_passion --temp
--imbmrpath ...`, options.py:4-52); transform pipelines stay declarative
strings parsed by the restricted builder in data/transforms.py instead of
raw eval.
"""

from __future__ import annotations

import argparse
import os
from dataclasses import dataclass, field


def str2bool(v: str) -> bool:
    """Boolean flag parser (utils/str2bool.py:1-8 — the reference ships it
    unused; its drivers use store_true flags instead). Same accepted tokens,
    same ValueError on anything else."""
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError("Unsupported value encountered.")


class AttrDict(dict):
    """Attribute-style nested config dict (utils/parser.py:18-61 — vestigial
    in the reference: no .yaml configs ship with it). Reading a missing
    attribute auto-creates a nested AttrDict, exactly like the original;
    ``merge`` deep-merges another mapping."""

    def __getattr__(self, name):
        if name in self.__dict__:
            return self.__dict__[name]
        if name in self:
            return self[name]
        if name.startswith("__"):
            raise AttributeError(name)
        self[name] = AttrDict()
        return self[name]

    def __setattr__(self, name, value):
        if name in self.__dict__:
            self.__dict__[name] = value
        else:
            self[name] = value

    def merge(self, other) -> None:
        for k, v in other.items():
            if k in self and isinstance(v, dict) and isinstance(self[k],
                                                               dict):
                AttrDict.merge(self[k], v)
            else:
                self[k] = AttrDict.cast(v) if isinstance(v, dict) else v

    @staticmethod
    def cast(d):
        if not isinstance(d, dict):
            return d
        return AttrDict({k: AttrDict.cast(v) for k, v in d.items()})


def parse_value(d):
    """Recursive literal coercion (utils/parser.py:70-82): strings that
    parse as python literals or fractions become values; dicts become
    AttrDicts. Uses ast.literal_eval — never eval."""
    from ast import literal_eval
    from fractions import Fraction

    if isinstance(d, dict):
        return AttrDict({k: parse_value(v) for k, v in d.items()})
    if isinstance(d, str):
        try:
            return literal_eval(d)
        except (ValueError, SyntaxError):
            try:
                return float(Fraction(d))
            except (ValueError, ZeroDivisionError):
                return d
    return d


def load_yaml_config(fname: str) -> AttrDict:
    """YAML config file -> AttrDict with literal coercion
    (utils/parser.py:84-87), using yaml.safe_load instead of the
    reference's unsafe yaml.load."""
    import yaml

    with open(fname) as f:
        return parse_value(yaml.safe_load(f))


def train_transforms_for(patch_size: int = 80) -> str:
    """The reference training pipeline (options.py:50) at a given crop."""
    s = patch_size
    return (f"Compose([RandCrop3D(({s},{s},{s})), RandomRotion(10), "
            "RandomIntensityChange((0.1,0.1)), RandomFlip(0), "
            "NumpyType((np.float32, np.int64)),])")


TRAIN_TRANSFORMS = train_transforms_for(80)
TEST_TRANSFORMS = "Compose([NumpyType((np.float32, np.int64)),])"


@dataclass
class TrainConfig:
    model: str = "mmformer"
    batch_size: int = 1
    lr: float = 2e-4
    weight_decay: float = 1e-4
    num_epochs: int = 300
    temp: float = 4.0
    region_fusion_start_epoch: int = 0
    seed: int = 1037
    gpu: str = ""  # accepted for CLI parity; device selection is JAX-side
    mask_type: str = "idt"  # pdt | idt | idt_drop
    use_pretrain: bool = False
    use_passion: bool = False
    use_valid: bool = False
    dataname: str = "BraTS/BRATS2020"
    datapath: str = "BraTS/BRATS2020_Training_none_npy"
    imbmrpath: str = "BraTS/brats_split/Brats2020_imb_split_mr2468.csv"
    savepath: str = "outputs/run"
    resume: str | None = None
    dataroot: str | None = None
    # TPU-build extras (defaults match the reference's hardcoded values)
    patch_size: int = 80
    basic_dims: int | None = None  # override backbone width (smoke runs)
    data_parallel: int = 0  # 0=single device, -1=all devices, N=first N
    num_cls: int = 4
    window_batch: int = 0  # 0 = auto (per-case chunk sizing, measured best)
    num_workers: int = 8
    iters_per_epoch: int | None = None  # cap for smoke runs
    train_transforms: str = ""
    test_transforms: str = TEST_TRANSFORMS

    def __post_init__(self):
        if not self.train_transforms:
            self.train_transforms = train_transforms_for(self.patch_size)

    @property
    def model_kwargs(self) -> dict:
        """kwargs for models.get_model beyond the reference surface."""
        return {"basic_dims": self.basic_dims} if self.basic_dims else {}

    @property
    def dataroot_path(self) -> str:
        if self.dataroot:
            return os.path.abspath(self.dataroot)
        return os.path.abspath(os.path.join(os.path.dirname(__file__),
                                            "..", "datasets"))

    @property
    def dataset_path(self) -> str:
        return os.path.abspath(os.path.join(self.dataroot_path, self.datapath))

    @property
    def imbmr_path(self) -> str:
        if os.path.isabs(self.imbmrpath):
            return self.imbmrpath
        return os.path.join(self.dataroot_path, self.imbmrpath)


def add_common_args(p: argparse.ArgumentParser) -> None:
    d = TrainConfig()
    p.add_argument("--model", default=d.model, type=str)
    p.add_argument("-batch_size", "--batch_size", default=d.batch_size, type=int)
    p.add_argument("--lr", default=d.lr, type=float)
    p.add_argument("--weight_decay", default=d.weight_decay, type=float)
    p.add_argument("--num_epochs", default=d.num_epochs, type=int)
    p.add_argument("--temp", default=d.temp, type=float)
    p.add_argument("--region_fusion_start_epoch",
                   default=d.region_fusion_start_epoch, type=int)
    p.add_argument("--seed", default=d.seed, type=int)
    p.add_argument("--gpu", default=d.gpu, type=str)
    p.add_argument("--mask_type", default=d.mask_type, type=str)
    p.add_argument("--use_pretrain", action="store_true")
    p.add_argument("--use_passion", action="store_true")
    p.add_argument("--use_valid", action="store_true")
    p.add_argument("--dataname", default=d.dataname, type=str)
    p.add_argument("--datapath", default=d.datapath, type=str)
    p.add_argument("--imbmrpath", default=d.imbmrpath, type=str)
    p.add_argument("--savepath", default=d.savepath, type=str)
    p.add_argument("--resume", default=None, type=str)
    p.add_argument("--dataroot", default=None, type=str,
                   help="dataset root (default: ../datasets next to package)")
    p.add_argument("--patch_size", default=d.patch_size, type=int)
    p.add_argument("--basic_dims", default=None, type=int,
                   help="override backbone conv width (reference hardcodes "
                        "8, rfnet.py:11/mmformer.py:11; small values for "
                        "smoke runs)")
    p.add_argument("--data_parallel", default=d.data_parallel, type=int,
                   help="data-parallel mesh size: 0 = single device, "
                        "-1 = all visible devices, N = first N devices "
                        "(replaces the reference's nn.DataParallel, "
                        "train.py:90)")
    p.add_argument("--window_batch", default=d.window_batch, type=int)
    p.add_argument("--num_workers", default=d.num_workers, type=int)
    p.add_argument("--iters_per_epoch", default=None, type=int)


def parse_config(argv=None) -> TrainConfig:
    p = argparse.ArgumentParser()
    add_common_args(p)
    ns = p.parse_args(argv)
    return TrainConfig(**{k: v for k, v in vars(ns).items()
                          if k in TrainConfig.__dataclass_fields__})

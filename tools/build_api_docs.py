"""API documentation generator: package docstrings → markdown.

Counterpart of the reference's `tools/build_api_docs.py` (which drives
tensorflow_docs). Walks the public modules of `recommenders_tpu`, and for
every public class/function renders its signature and docstring into one
markdown file per module under `docs/api/`.

Usage: python tools/build_api_docs.py [--out docs/api]
"""

import argparse
import importlib
import inspect
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODULES = [
    "recommenders_tpu.tasks.retrieval",
    "recommenders_tpu.tasks.ranking",
    "recommenders_tpu.tasks.listwise",
    "recommenders_tpu.layers.factorized_top_k",
    "recommenders_tpu.layers.approximate",
    "recommenders_tpu.layers.loss",
    "recommenders_tpu.layers.blocks",
    "recommenders_tpu.layers.sequential",
    "recommenders_tpu.layers.feature_interaction.dcn",
    "recommenders_tpu.layers.feature_interaction.dot_interaction",
    "recommenders_tpu.metrics.base",
    "recommenders_tpu.metrics.factorized_top_k",
    "recommenders_tpu.embedding.config",
    "recommenders_tpu.embedding.embedding",
    "recommenders_tpu.embedding.engine",
    "recommenders_tpu.embedding.partial",
    "recommenders_tpu.embedding.unified",
    "recommenders_tpu.embedding.sparse_optimizer",
    "recommenders_tpu.models.base",
    "recommenders_tpu.models.retrieval",
    "recommenders_tpu.models.ranking",
    "recommenders_tpu.models.multitask",
    "recommenders_tpu.models.hybrid",
    "recommenders_tpu.optimizers.clippy_adagrad",
    "recommenders_tpu.optimizers.composite",
    "recommenders_tpu.parallel.mesh",
    "recommenders_tpu.parallel.corpus",
    "recommenders_tpu.parallel.retrieval_step",
    "recommenders_tpu.ops.topk",
    "recommenders_tpu.ops.scoring",
    "recommenders_tpu.data.movielens",
    "recommenders_tpu.data.vocab",
    "recommenders_tpu.data.preprocessing",
    "recommenders_tpu.data.native_loader",
    "recommenders_tpu.utils.checkpoint",
    "recommenders_tpu.utils.export",
    "recommenders_tpu.utils.profiling",
]


def _signature(obj) -> str:
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # Default values whose repr embeds a memory address (flax's module
    # sentinel, lambda defaults) would churn the generated files on
    # every run.
    sig = re.sub(r"<([\w.]+) object at 0x[0-9a-f]+>", r"<\1>", sig)
    return re.sub(r"<function ([\w.<>]+) at 0x[0-9a-f]+>", r"<\1>", sig)


def render_module(module_name: str) -> str:
    mod = importlib.import_module(module_name)
    lines = [f"# `{module_name}`", ""]
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), ""]
    members = [
        (name, obj)
        for name, obj in vars(mod).items()
        if not name.startswith("_")
        and (inspect.isclass(obj) or inspect.isfunction(obj))
        and getattr(obj, "__module__", None) == module_name
    ]
    for name, obj in members:
        kind = "class" if inspect.isclass(obj) else "def"
        lines.append(f"## `{kind} {name}{_signature(obj)}`")
        lines.append("")
        if obj.__doc__:
            lines.append(inspect.cleandoc(obj.__doc__))
            lines.append("")
        if inspect.isclass(obj):
            for mname, meth in vars(obj).items():
                if mname.startswith("_") or not inspect.isfunction(meth):
                    continue
                if not meth.__doc__:
                    continue
                lines.append(
                    f"### `{name}.{mname}{_signature(meth)}`"
                )
                lines.append("")
                lines.append(inspect.cleandoc(meth.__doc__))
                lines.append("")
    return "\n".join(lines) + "\n"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(REPO, "docs", "api"))
    args = parser.parse_args()
    os.makedirs(args.out, exist_ok=True)

    index = ["# API reference", ""]
    for module_name in MODULES:
        fname = module_name.replace("recommenders_tpu.", "").replace(
            ".", "_"
        ) + ".md"
        with open(os.path.join(args.out, fname), "w") as f:
            f.write(render_module(module_name))
        index.append(f"- [`{module_name}`]({fname})")
    with open(os.path.join(args.out, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(MODULES) + 1} files to {args.out}")


if __name__ == "__main__":
    main()

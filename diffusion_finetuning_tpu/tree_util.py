"""Small nested-dict pytree helpers used across the framework.

JAX/Flax params are nested dicts; "module surgery" from the reference
(monkeypatching ``nn.Module`` children, lora.py:137-183) becomes functional
path-addressed updates on these trees.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Mapping, Sequence, Tuple

Path = Tuple[str, ...]

__all__ = ["Path", "tree_get", "tree_set", "tree_has", "tree_delete", "flatten_paths"]


def tree_get(tree: Mapping[str, Any], path: Sequence[str]) -> Any:
    node: Any = tree
    for key in path:
        node = node[key]
    return node


def tree_has(tree: Mapping[str, Any], path: Sequence[str]) -> bool:
    node: Any = tree
    for key in path:
        if not isinstance(node, Mapping) or key not in node:
            return False
        node = node[key]
    return True


def tree_set(tree: Dict[str, Any], path: Sequence[str], value: Any) -> Dict[str, Any]:
    """Functionally set ``tree[path] = value``, creating intermediate dicts.

    Returns a new tree; shares unmodified subtrees with the input.
    """
    if not path:
        return value
    key = path[0]
    sub = tree.get(key, {}) if isinstance(tree, Mapping) else {}
    new = dict(tree) if isinstance(tree, Mapping) else {}
    new[key] = tree_set(sub if isinstance(sub, Mapping) else {}, path[1:], value)
    return new


def tree_delete(tree: Mapping[str, Any], path: Sequence[str]) -> Dict[str, Any]:
    """Functionally remove the entry at ``path`` (pruning empty parents)."""
    if not path:
        raise ValueError("empty path")
    key = path[0]
    if key not in tree:
        return dict(tree)
    new = dict(tree)
    if len(path) == 1:
        new.pop(key, None)
    else:
        sub = tree_delete(tree[key], path[1:])
        if sub:
            new[key] = sub
        else:
            new.pop(key, None)
    return new


def flatten_paths(tree: Mapping[str, Any], prefix: Path = ()) -> Iterator[Tuple[Path, Any]]:
    """Yield (path, leaf) for every non-dict leaf, depth-first sorted order."""
    for key in sorted(tree.keys()):
        val = tree[key]
        if isinstance(val, Mapping):
            yield from flatten_paths(val, prefix + (key,))
        else:
            yield prefix + (key,), val

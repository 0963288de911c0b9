"""
Build a static HTML gallery index over a directory of visualization images
(reference: scripts/visualization/create_fin_test_viz_index.py — the same
role: one browsable page over a test-set visualization dump).

Groups images by subdirectory, lazy-loads thumbnails, links originals.

Usage:
    python scripts/visualization/make_viz_index.py --dir viz_out/ \
        [--output viz_out/index.html] [--title "NCDB fin test"] [--columns 4]
"""

import argparse
import html
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

IMG_EXTS = ('.png', '.jpg', '.jpeg', '.webp', '.gif')

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 16px; background: #111; color: #eee; }}
 h1 {{ font-size: 20px; }} h2 {{ font-size: 16px; margin-top: 28px; }}
 .grid {{ display: grid; grid-template-columns: repeat({columns}, 1fr); gap: 8px; }}
 .cell {{ background: #1c1c1c; padding: 4px; border-radius: 4px; }}
 .cell img {{ width: 100%; display: block; }}
 .cell .name {{ font-size: 11px; color: #999; word-break: break-all; }}
</style></head><body>
<h1>{title}</h1>
<p>{count} images</p>
{sections}
</body></html>
"""

SECTION = '<h2>{name}</h2>\n<div class="grid">\n{cells}</div>\n'
CELL = ('<div class="cell"><a href="{href}">'
        '<img loading="lazy" src="{href}"></a>'
        '<div class="name">{name}</div></div>\n')


def collect(root):
    """{relative subdir: [relative image paths]} sorted."""
    groups = {}
    for dirpath, _, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        imgs = sorted(f for f in files
                      if f.lower().endswith(IMG_EXTS))
        if imgs:
            groups[rel] = [os.path.join(rel, f) if rel != '.' else f
                           for f in imgs]
    return dict(sorted(groups.items()))


def build_index(root, output=None, title=None, columns=4):
    groups = collect(root)
    sections, count = [], 0
    for name, paths in groups.items():
        cells = ''.join(
            CELL.format(href=html.escape(p.replace(os.sep, '/')),
                        name=html.escape(os.path.basename(p)))
            for p in paths)
        sections.append(SECTION.format(
            name=html.escape('(top level)' if name == '.' else name),
            cells=cells))
        count += len(paths)
    page = PAGE.format(title=html.escape(title or os.path.basename(
        os.path.abspath(root))), columns=columns,
        count=count, sections=''.join(sections))
    output = output or os.path.join(root, 'index.html')
    with open(output, 'w') as f:
        f.write(page)
    print('wrote {} ({} images, {} groups)'.format(
        output, count, len(groups)))
    return output


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dir', required=True)
    p.add_argument('--output', default=None)
    p.add_argument('--title', default=None)
    p.add_argument('--columns', type=int, default=4)
    a = p.parse_args()
    build_index(a.dir, a.output, a.title, a.columns)


if __name__ == '__main__':
    main()

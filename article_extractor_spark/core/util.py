"""DOM predicates/traversals used by the extraction pipeline.

Semantics-for-semantics port of the reference's helper layer
(`/root/reference/src/util.rs:1-1149`) onto our pure-Python DOM.
All length comparisons use UTF-8 **byte** lengths (Rust ``str::len``),
which matters for the CJK fixtures."""

from __future__ import annotations

import math

from . import constants
from .dom import ELEMENT_NODE, TEXT_NODE, Document, Node, serialize_node
from .emoji import is_emoji_char
from .xpath import Context, XPathError


def blen(s: str) -> int:
    """Rust str::len == UTF-8 byte length."""
    return len(s.encode("utf-8", "surrogatepass"))


def evaluate_xpath(ctx: Context, xpath: str, throw_if_empty: bool = False):
    try:
        nodes = ctx.find_nodes(xpath)
    except XPathError:
        raise
    if not nodes and throw_if_empty:
        raise XPathError(f"empty result for {xpath}")
    return nodes


def get_attribute(ctx: Context, xpath: str, attribute: str) -> str | None:
    try:
        nodes = evaluate_xpath(ctx, xpath, False)
    except XPathError:
        return None
    for node in nodes:
        if isinstance(node, Node):
            v = node.get_attribute(attribute)
            if v is not None:
                return v
    return None


def extract_value(ctx: Context, xpath: str) -> str | None:
    try:
        nodes = evaluate_xpath(ctx, xpath, False)
    except XPathError:
        return None
    if nodes:
        return nodes[0].get_content()
    return None


def extract_value_merge(ctx: Context, xpath: str) -> str | None:
    try:
        nodes = evaluate_xpath(ctx, xpath, True)
    except XPathError:
        return None
    val = []
    for node in nodes:
        part = "".join(f" {s}" for s in node.get_content().split())
        val.append(part)
        val.append(" ")
    return "".join(val).strip()


def strip_node(ctx: Context, xpath: str) -> None:
    try:
        node_vec = evaluate_xpath(ctx, xpath, False)
    except XPathError:
        return
    node_set = [n for n in node_vec if isinstance(n, Node)]
    ids = {id(n) for n in node_set}
    for node in node_set:
        tag_name = node.get_name()
        if tag_name.upper() in constants.EMBED_TAG_NAMES and any(
            constants.VIDEOS.search(value) for _n, value in node.get_attributes()
        ):
            continue
        if _parent_part_of_result(node, ids):
            continue
        node.unlink()


def collect_elements_by_tags(document, tags) -> dict:
    """ONE document-order DFS returning ``{tag: [elements]}`` for several
    absolute ``//tag`` scans over an unmutated tree.  Each
    ``evaluate_xpath(ctx, '//tag')`` costs a full-tree walk; consecutive
    scans at the same tree state fuse into this single walk (NOTES.md
    hot-list: fix_urls' five evals, fix_lazy_images' three).  Semantics
    match the XPath fast-scan exactly: case-sensitive name test,
    element-only traversal, root element included."""
    out = {t: [] for t in tags}
    root = document.get_root_element()
    if root is None or root.type != ELEMENT_NODE:
        return out
    stack = [root]
    pop = stack.pop
    extend = stack.extend
    get = out.get
    while stack:
        n = pop()
        lst = get(n.name)
        if lst is not None:
            lst.append(n)
        ch = n.children
        if ch:
            extend([c for c in ch[::-1] if c.type == ELEMENT_NODE])
    return out


def collect_elements_ordered(document, tags) -> list:
    """Like :func:`collect_elements_by_tags` but one combined DOC-ORDER
    list of every element whose name is in ``tags`` — for fused passes
    that need the interleaved order across tags (e.g. the //h2 eval that
    runs after h1->h2 renames sees renamed h1s and original h2s merged in
    document order)."""
    want = frozenset(tags)
    out: list = []
    root = document.get_root_element()
    if root is None or root.type != ELEMENT_NODE:
        return out
    stack = [root]
    pop = stack.pop
    extend = stack.extend
    append = out.append
    while stack:
        n = pop()
        if n.name in want:
            append(n)
        ch = n.children
        if ch:
            extend([c for c in ch[::-1] if c.type == ELEMENT_NODE])
    return out


def strip_collected(node_set: list) -> None:
    """strip_node semantics over a pre-collected node list (doc order):
    video-embed exemption + skip nodes whose ancestor is in the same set."""
    ids = {id(n) for n in node_set}
    for node in node_set:
        tag_name = node.get_name()
        if tag_name.upper() in constants.EMBED_TAG_NAMES and any(
            constants.VIDEOS.search(value) for _n, value in node.get_attributes()
        ):
            continue
        if _parent_part_of_result(node, ids):
            continue
        node.unlink()


def _parent_part_of_result(node: Node, ids: set) -> bool:
    p = node.parent
    while p is not None:
        if id(p) in ids:
            return True
        p = p.parent
    return False


def strip_id_or_class(ctx: Context, id_or_class: str) -> None:
    xpath = (
        f"//*[contains(@class, '{id_or_class}') or contains(@id, '{id_or_class}')]"
    )
    ancestor = xpath[2:]
    query = f"{xpath}[not(ancestor::{ancestor})]"
    try:
        node_vec = evaluate_xpath(ctx, query, False)
    except XPathError:
        return
    for node in node_vec:
        if isinstance(node, Node):
            node.unlink()


def get_signature(node: Node) -> str:
    # fast path: most nodes carry neither class nor id — identical to
    # the general form, which yields "" for both-absent
    if not node.has_attribute("class") and not node.has_attribute("id"):
        return ""
    match_string = "".join(f" {c}" for c in node.get_class_names())
    node_id = node.get_property("id")
    if node_id is not None:
        return f"{match_string} {node_id}"
    return match_string


def is_probably_visible(node: Node) -> bool:
    is_hidden = node.has_attribute("hidden")
    aria_hidden = node.get_attribute("aria-hidden") == "true"
    if not is_hidden and not aria_hidden:
        # visible regardless of fallback-image — skip the class split
        return True
    return any("fallback-image" in c for c in node.get_class_names())


def is_whitespace(node: Node) -> bool:
    if node.type == TEXT_NODE:
        return node.get_content().strip() == ""
    return node.type == ELEMENT_NODE and node.get_name().upper() == "BR"


def remove_and_next(node: Node) -> Node | None:
    nxt = next_node(node, True)
    node.unlink()
    return nxt


def next_node(node: Node, ignore_self_and_kids: bool) -> Node | None:
    # hot path of the readability prune walk: attribute access inlined
    if not ignore_self_and_kids:
        ch = node.children
        if ch:
            return ch[0]
    nxt = node.get_next_sibling()
    if nxt is not None:
        return nxt
    cur = node
    while True:
        parent = cur.parent
        if parent is None or isinstance(parent, Document):
            return None
        name = parent.name
        if name == "html" or name.upper() == "HTML":
            return None
        nxt = parent.get_next_sibling()
        if nxt is not None:
            return nxt
        cur = parent


def get_inner_text(node: Node, normalize_spaces: bool) -> str:
    content = node.get_content().strip()
    if normalize_spaces:
        return constants.NORMALIZE.sub(" ", content)
    return content


def text_similarity(a: str, b: str) -> float:
    a = a.lower()
    b = b.lower()
    tokens_a = [t for t in constants.TOKENIZE.split(a) if t]
    tokens_b = [t for t in constants.TOKENIZE.split(b) if t]
    if not tokens_a or not tokens_b:
        return 0.0
    tokens_b_total = float(blen(" ".join(tokens_b)))
    set_a = tokens_a
    uniq_tokens_b = [t for t in tokens_b if t not in set_a]
    uniq_tokens_b_total = float(blen(" ".join(uniq_tokens_b)))
    distance_b = uniq_tokens_b_total / tokens_b_total
    return 1.0 - distance_b


def header_duplicates_title(node: Node, title: str | None) -> bool:
    name = node.get_name().lower()
    if name != "h1" and name != "h2":
        return False
    if title is None:
        return False
    heading = get_inner_text(node, False)
    return text_similarity(title, heading) > 0.75


def has_any_descendent_tag(node: Node, tag_names: frozenset | set) -> bool:
    children = node.get_child_elements()
    if any(c.get_name().upper() in tag_names for c in children):
        return True
    return any(has_any_descendent_tag(c, tag_names) for c in children)


def has_ancestor_tag(node: Node, tag_name: str, max_depth=None, filter_fn=None) -> bool:
    max_depth = 3 if max_depth is None else max_depth
    tag_name = tag_name.upper()
    depth = 0
    cur = node.get_parent()
    while True:
        if depth > max_depth:
            return False
        if cur is None or isinstance(cur, Document):
            return False
        if cur.get_name().upper() == tag_name and (
            filter_fn is None or filter_fn(cur)
        ):
            return True
        cur = cur.get_parent()
        depth += 1


def has_single_tag_inside_element(node: Node, tag: str) -> bool:
    elems = node.get_child_elements()
    if len(elems) != 1 or elems[0].get_name().upper() != tag:
        return False
    return not any(
        c.type == TEXT_NODE and constants.HAS_CONTENT.search(c.get_content())
        for c in node.get_child_nodes()
    )


def is_element_without_content(node: Node) -> bool:
    if node.type != ELEMENT_NODE:
        return False
    n_children = len(node.get_child_nodes())
    return (
        n_children == 0
        # one fused walk: BR/HR are disjoint, count equals the two-scan sum
        or n_children == len(get_elements_by_tag_names(node, _BR_HR))
    ) and node.get_content().strip() == ""


_BR_HR = frozenset(("BR", "HR"))


def is_element_without_children(node: Node) -> bool:
    if node.type != ELEMENT_NODE:
        return False
    n_children = len(node.get_child_nodes())
    return (
        (n_children == 0 or node.get_content().strip() == "")
        and not get_elements_by_tag_names(node, constants.VALID_EMPTY_TAGS)
    )


def get_elements_by_tag_names(node: Node, tags) -> list[Node]:
    vec: list[Node] = []

    def rec(n: Node):
        for child in n.get_child_elements():
            if child.get_name().upper() in tags:
                vec.append(child)
            rec(child)

    rec(node)
    return vec


def get_elements_by_tag_name(node: Node, tag: str) -> list[Node]:
    tag_lower = tag.lower()
    all_tags = tag == "*"
    vec: list[Node] = []
    append = vec.append
    # iterative preorder DFS over element children (hot path)
    stack = [c for c in node.children[::-1] if c.type == ELEMENT_NODE]
    pop = stack.pop
    push = stack.append
    while stack:
        child = pop()
        # parse-time names are lowercase; renamed nodes are uppercase —
        # compare case-insensitively without allocating when possible
        name = child.name
        if all_tags or name == tag_lower or name.lower() == tag_lower:
            append(child)
        ch = child.children
        if ch:
            for c in ch[::-1]:
                if c.type == ELEMENT_NODE:
                    push(c)
    return vec


def get_first_element_by_tag_name(node: Node, tag: str) -> Node | None:
    tag = tag.upper()

    def rec(n: Node):
        for child in n.get_child_elements():
            if child.get_name().upper() == tag:
                return child
            found = rec(child)
            if found is not None:
                return found
        return None

    return rec(node)


def get_link_density(node: Node) -> float:
    text_length = blen(get_inner_text(node, True))
    if text_length == 0:
        return 0.0
    link_length = 0.0
    for link_node in get_elements_by_tag_name(node, "A"):
        href = link_node.get_attribute("href")
        if href is not None:
            coefficient = 0.3 if constants.HASH_URL.search(href) else 1.0
            link_length += blen(get_inner_text(link_node, True)) * coefficient
    return link_length / float(text_length)


def has_child_block_element(node: Node) -> bool:
    return any(
        c.get_name().upper() in constants.DIV_TO_P_ELEMS or has_child_block_element(c)
        for c in node.get_child_nodes()
    )


def get_node_ancestors(node: Node, max_depth=None) -> list[Node]:
    ancestors = []
    cur = node
    max_depth = max_depth if max_depth is not None else 1 << 62
    for _ in range(max_depth):
        parent = cur.get_parent()
        if parent is None or isinstance(parent, Document):
            return ancestors
        ancestors.append(parent)
        cur = parent
    return ancestors


def has_tag_name(node: Node | None, tag_name: str) -> bool:
    return node is not None and node.get_name().upper() == tag_name.upper()


def is_single_image(node: Node) -> bool:
    if node.get_name().upper() == "IMG":
        return True
    elems = node.get_child_elements()
    if len(elems) != 1 or node.get_content().strip() != "":
        return False
    return is_single_image(elems[0])


def clean_headers(root: Node) -> None:
    nodes = get_elements_by_tag_name(root, "h1")
    nodes.extend(get_elements_by_tag_name(root, "h2"))
    for node in reversed(nodes):
        if get_class_weight(node) < 0:
            node.unlink()


def replace_schema_org_objects(root: Node) -> None:
    from .schema_objects import ImageObject, VideoObject

    nodes = get_elements_by_tag_name(root, "div")
    for node in reversed(nodes):
        video_object = VideoObject.parse_node(node)
        if video_object is not None:
            video_object.replace(node)
            continue
        image_object = ImageObject.parse_node(node)
        if image_object is not None:
            image_object.replace(node)


def replace_emoji_images(root: Node, document: Document) -> None:
    img_nodes = get_elements_by_tag_name(root, "img")
    for img_node in img_nodes:
        img_alt = img_node.get_attribute("alt")
        if img_alt is not None and is_emoji(img_alt):
            parent = img_node.get_parent()
            if parent is not None and not isinstance(parent, Document):
                emoji_text_node = Node.new_text(img_alt, document)
                parent.replace_child_node(emoji_text_node, img_node)


def is_emoji(text: str) -> bool:
    if len(text) != 1:
        return False
    return is_emoji_char(text)


def clean_conditionally(root: Node, tag: str) -> None:
    nodes = get_elements_by_tag_name(root, tag)
    for node in reversed(nodes):
        if _should_remove(node, tag):
            node.unlink()


def _should_remove(node: Node, tag: str) -> bool:
    is_list = tag == "ul" or tag == "ol"
    if not is_list:
        list_length = 0.0
        for list_node in get_elements_by_tag_name(node, "ul"):
            list_length += blen(get_inner_text(list_node, False))
        for list_node in get_elements_by_tag_name(node, "ol"):
            list_length += blen(get_inner_text(list_node, False))
        denom = blen(get_inner_text(node, False))
        if denom == 0:
            # Rust f64: 0/0 = NaN (NaN > 0.9 is false); x/0 = inf (> 0.9)
            is_list = list_length > 0.0
        else:
            is_list = (list_length / denom) > 0.9

    if tag == "table" and _is_data_table(node):
        return False
    if has_ancestor_tag(node, "table", 1 << 62, _is_data_table):
        return False
    if has_ancestor_tag(node, "code"):
        return False

    weight = get_class_weight(node)
    if weight < 0:
        return True

    if _get_char_count(node, ",") < 10:
        # single DFS for all tag counts (the reference runs one scan per
        # tag; counts are identical, order of embed checks preserved)
        counts = {"p": 0, "img": 0, "li": 0, "input": 0,
                  "imageobject": 0, "videoobject": 0, "video": 0}
        headings: list[Node] = []
        embeds_by_tag: dict[str, list[Node]] = {
            "object": [], "embed": [], "iframe": []}
        stack = [c for c in reversed(node.children) if c.type == ELEMENT_NODE]
        while stack:
            child = stack.pop()
            nm = child.name.lower()
            if nm in counts:
                counts[nm] += 1
            elif nm in embeds_by_tag:
                embeds_by_tag[nm].append(child)
            elif nm in ("h1", "h2", "h3", "h4", "h5", "h6"):
                headings.append(child)
            if child.children:
                stack.extend(
                    c for c in reversed(child.children) if c.type == ELEMENT_NODE
                )
        p = counts["p"]
        img = counts["img"]
        li = counts["li"] - 100
        input_count = counts["input"]

        text_length = blen(get_inner_text(node, False))
        if text_length == 0:
            heading_density = 0.0
        else:
            heading_density = sum(
                blen(get_inner_text(h, False)) for h in headings
            ) / float(text_length)

        embed_count = 0
        for embed_tag in ("object", "embed", "iframe"):
            for embed_node in embeds_by_tag[embed_tag]:
                for _name, value in embed_node.get_attributes():
                    if constants.VIDEOS.search(value):
                        return False
                embed_count += 1

        link_density = get_link_density(node)
        content = get_inner_text(node, True)
        content_length = blen(content)
        has_figure_ancestor = has_ancestor_tag(node, "figure")

        if (counts["imageobject"] > 0 or counts["videoobject"] > 0
                or counts["video"] > 0):
            return False

        have_to_remove = (
            (img > 1 and (p / img if img else 0.0) < 0.5 and not has_figure_ancestor)
            or (not is_list and li > p)
            or (input_count > math.floor(p / 3.0))
            or (
                not is_list
                and heading_density < 0.9
                and content_length < 25
                and (img == 0 or img > 2)
                and not has_figure_ancestor
            )
            or (not is_list and weight < 25 and link_density > 0.2)
            or (weight >= 25 and link_density > 0.5)
            or ((embed_count == 1 and content_length < 75) or embed_count > 1)
        )

        if is_list and have_to_remove:
            for child in node.get_child_elements():
                if len(child.get_child_elements()) > 1:
                    return have_to_remove
            if img == counts["li"]:
                return False
        return have_to_remove
    return False


def get_class_weight(node: Node) -> int:
    weight = 0
    class_names = node.get_property("class")
    if class_names is not None:
        if constants.NEGATIVE.search(class_names):
            weight -= 25
        if constants.POSITIVE.search(class_names):
            weight += 25
    node_id = node.get_property("id")
    if node_id is not None:
        if constants.NEGATIVE.search(node_id):
            weight -= 25
        if constants.POSITIVE.search(node_id):
            weight += 25
    return weight


def _get_char_count(node: Node, char: str) -> int:
    return get_inner_text(node, False).count(char)


def _get_text_density(node: Node, tags) -> float:
    text_length = blen(get_inner_text(node, False))
    if text_length == 0:
        return 0.0
    children_length = 0
    for tag in tags:
        for child in get_elements_by_tag_name(node, tag):
            children_length += blen(get_inner_text(child, False))
    return children_length / float(text_length)


def _is_data_table(node: Node) -> bool:
    v = node.get_attribute(constants.DATA_TABLE_ATTR)
    if v == "true":
        return True
    if v == "false":
        return False
    return False


def mark_data_tables(ctx: Context) -> None:
    try:
        nodes = evaluate_xpath(ctx, "//table", False)
    except XPathError:
        return
    for node in nodes:
        if not isinstance(node, Node):
            continue
        if node.get_attribute("role") == "presentation":
            node.set_attribute(constants.DATA_TABLE_ATTR, "false")
            continue
        if node.get_attribute("datatable") == "0":
            node.set_attribute(constants.DATA_TABLE_ATTR, "false")
            continue
        if node.get_attribute("summary") is not None:
            node.set_attribute(constants.DATA_TABLE_ATTR, "true")
            continue
        captions = get_elements_by_tag_name(node, "caption")
        if captions and captions[0].get_child_nodes():
            node.set_attribute(constants.DATA_TABLE_ATTR, "true")
            continue
        # NOTE: faithful to the reference's fall-through here
        # (`/root/reference/src/util.rs:813-820`): finding th/thead/... sets
        # "true" but does NOT stop; nested-table/size checks may overwrite.
        for descendant in ("col", "colgroup", "tfoot", "thead", "th"):
            if get_elements_by_tag_name(node, descendant):
                node.set_attribute(constants.DATA_TABLE_ATTR, "true")
                continue
        if get_elements_by_tag_name(node, "table"):
            node.set_attribute(constants.DATA_TABLE_ATTR, "false")
            continue
        rows, columns = get_row_and_column_count(node)
        if rows >= 10 or columns > 4:
            node.set_attribute(constants.DATA_TABLE_ATTR, "true")
            continue
        node.set_attribute(
            constants.DATA_TABLE_ATTR, "true" if rows * columns > 10 else "false"
        )


def get_row_and_column_count(node: Node) -> tuple[int, int]:
    if node.get_name().upper() != "TABLE":
        return (0, 0)
    rows = 0
    columns = 0
    for tr in get_elements_by_tag_name(node, "tr"):
        row_span = _parse_usize(tr.get_attribute("rowspan")) or 1
        rows += row_span
        columns_in_this_row = 0
        for cell in get_elements_by_tag_name(tr, "td"):
            colspan = _parse_usize(cell.get_attribute("colspan")) or 1
            columns_in_this_row += colspan
        columns = max(columns, columns_in_this_row)
    return (rows, columns)


def _parse_usize(v: str | None) -> int | None:
    if v is None:
        return None
    # Rust usize::from_str: ASCII digits only, optional leading '+'
    s = v
    if s.startswith("+"):
        s = s[1:]
    if s and all("0" <= c <= "9" for c in s):
        try:
            return int(s)
        except ValueError:
            return None
    return None


def is_phrasing_content(node: Node) -> bool:
    if node.type == TEXT_NODE:
        return True
    tag_name = node.get_name().upper()
    if tag_name in constants.PHRASING_ELEMS:
        return True
    return tag_name in ("A", "DEL", "INS") and all(
        is_phrasing_content(c) for c in node.get_child_nodes()
    )


def replace_brs(node: Node, document: Document) -> None:
    br_nodes = get_elements_by_tag_name(node, "br")
    for br_node in br_nodes:
        if br_node.parent is None:
            continue
        nxt = br_node.get_next_sibling()
        replaced = False
        while nxt is not None:
            is_text_whitespace = (
                nxt.type == TEXT_NODE and nxt.get_content().strip() == ""
            )
            is_br_node = nxt.get_name().upper() == "BR"
            nxt_sib = nxt.get_next_sibling()
            next_is_br_node = (
                nxt_sib is not None and nxt_sib.get_name().upper() == "BR"
            )
            if not is_text_whitespace and not is_br_node:
                break
            to_unlink = nxt
            nxt = nxt_sib
            if is_br_node or (is_text_whitespace and next_is_br_node):
                replaced = True
                to_unlink.unlink()
        if not replaced:
            continue
        parent = br_node.get_parent()
        if parent is None:
            continue
        p = Node.new_element("p", document)
        parent.replace_child_node(p, br_node)

        nxt = p.get_next_sibling()
        while nxt is not None:
            if nxt.get_name().upper() == "BR":
                next_elem = nxt.get_next_element_sibling()
                if next_elem is not None and next_elem.get_name().upper() == "BR":
                    break
            if not is_phrasing_content(nxt):
                break
            sibling = nxt.get_next_sibling()
            p.add_child(nxt)
            nxt = sibling

        if not p.get_child_elements() and p.get_content().strip() == "":
            p.unlink()
            continue

        while True:
            last_child = p.get_last_child()
            if last_child is None:
                break
            if last_child.type == TEXT_NODE and last_child.get_content().strip() == "":
                last_child.unlink()
            else:
                break

        pparent = p.get_parent()
        if pparent is not None and not isinstance(pparent, Document):
            if pparent.get_name().upper() == "P":
                pparent.set_name("DIV")


def score_image_url(url: str) -> int:
    url = url.strip()
    score = 0
    if constants.POSITIVE_LEAD_IMAGE_URL_HINTS_REGEX.search(url):
        score += 20
    if constants.NEGATIVE_LEAD_IMAGE_URL_HINTS_REGEX.search(url):
        score -= 20
    if constants.GIF_REGEX.search(url):
        score -= 10
    if constants.JPG_REGEX.search(url):
        score += 10
    return score


def score_img_attr(img: Node) -> int:
    return 5 if img.get_attribute("alt") is not None else 0


def score_by_parents(img: Node) -> int:
    score = 0
    parent = img.get_parent()
    if isinstance(parent, Document):
        parent = None
    grand_parent = parent.get_parent() if parent is not None else None
    if isinstance(grand_parent, Document):
        grand_parent = None
    if has_tag_name(parent, "figure") or has_tag_name(grand_parent, "figure"):
        score += 25
    if parent is not None and constants.PHOTO_HINTS_REGEX.search(get_signature(parent)):
        score += 15
    if grand_parent is not None and constants.PHOTO_HINTS_REGEX.search(
        get_signature(grand_parent)
    ):
        score += 15
    return score


def score_by_sibling(img: Node) -> int:
    score = 0
    sibling = img.get_next_element_sibling()
    if sibling is not None:
        if sibling.get_name().lower() == "figcaption":
            score += 25
        if constants.PHOTO_HINTS_REGEX.search(get_signature(sibling)):
            score += 15
    return score


def _parse_f32(v: str | None) -> float | None:
    if v is None:
        return None
    try:
        return float(v.strip()) if v.strip() and v.strip()[0] not in "iInN" else None
    except ValueError:
        return None


def score_by_dimensions(img: Node) -> int:
    score = 0
    width = _parse_f32(img.get_attribute("width"))
    height = _parse_f32(img.get_attribute("height"))
    src = img.get_attribute("src") or ""
    if width is not None and width <= 50.0:
        score -= 50
    if height is not None and height <= 50.0:
        score -= 50
    if width is not None and height is not None and "sprite" not in src:
        area = width * height
        if area < 5000.0:
            score -= 100
        else:
            # f32::round: half away from zero (not banker's rounding)
            score += int(math.floor(area / 1000.0 + 0.5))
    return score


def score_by_position(length: int, index: int) -> int:
    return int(length / 2.0 - index)


def score_by_alt(node: Node) -> int:
    alt = node.get_attribute("alt")
    if alt is not None and is_emoji(alt):
        return -100
    return 0


__all__ = [n for n in dir() if not n.startswith("_")]


def serialize(node: Node) -> str:
    return serialize_node(node)

"""The full-text extraction pipeline (config path + cleanup + post-process).

Semantics port of `/root/reference/src/full_text_parser/mod.rs` —
``parse_offline`` / ``parse_page`` / ``prep_content`` / ``post_process_*`` /
thumbnail detection — re-expressed over the pure-Python DOM.  The Spark
layer wraps :func:`parse_offline` in a vectorized Arrow UDF; nothing in
this module knows about Spark."""

from __future__ import annotations

from . import constants, metadata, util
from .config import ConfigCollection, ConfigEntry, get_host_name
from .dom import Document, Node, parse_html as _dom_parse_html, serialize_node
from .metadata import Article
from .urlutil import RelativeUrlError, Url, UrlError, parse_ok
from .xpath import Context, XPathError


DEFAULT_BASE_URL = "http://fakehost/test/base/"


class FullTextParser:
    def __init__(self, config_collection: ConfigCollection | None = None):
        self.config_files = (
            config_collection if config_collection is not None else ConfigCollection()
        )

    # -- entry points ------------------------------------------------------

    def parse_offline(self, pages: list[str], config: ConfigEntry | None = None,
                      url: Url | None = None) -> Article:
        """`mod.rs:30-83`."""
        from .readability import extract_body as readability_extract_body

        if url is None:
            url = Url.parse(DEFAULT_BASE_URL)
        if config is None:
            config = self.get_grabber_config(url)
        global_config = self.config_files.get("global.txt")
        if global_config is None:
            global_config = ConfigEntry()

        article = Article(url)
        document = Document()
        root = Node.new_element("article", document)
        document.set_root_element(root)

        for page_html in pages:
            self._parse_page(article, page_html, root, config, global_config)

        context = Context(document)
        prevent_self_closing_tags(context)
        post_process_document(document)
        article.html = serialize_node(root)
        return article

    def _parse_page(self, article: Article, html: str, root: Node,
                    config: ConfigEntry | None, global_config: ConfigEntry) -> None:
        from .readability import extract_body as readability_extract_body

        document = parse_html_with_config(html, config, global_config)
        ctx = Context(document)
        metadata.extract(ctx, config, global_config, article)
        if article.thumbnail_url is None:
            article.thumbnail_url = check_for_thumbnail(ctx)
        prep_content(ctx, config, global_config, article.url, document,
                     article.title)
        found_body = extract_body(ctx, root, config, global_config)
        if not found_body:
            readability_extract_body(document, root, article.title)

    def get_grabber_config(self, url: Url) -> ConfigEntry | None:
        host = get_host_name(url)
        if host is None:
            return None
        return self.config_files.get(host + ".txt")

    def thumbnail_from_html(self, html: str) -> str | None:
        doc = _dom_parse_html(html)
        return check_for_thumbnail(Context(doc))


def parse_html_with_config(html: str, config: ConfigEntry | None,
                           global_config: ConfigEntry | None) -> Document:
    """Raw find/replace pre-pass + recovery parse (`mod.rs:122-145`)."""
    if config is not None:
        for replace in config.replace:
            html = html.replace(replace.to_replace, replace.replace_with)
    if global_config is not None:
        for replace in global_config.replace:
            html = html.replace(replace.to_replace, replace.replace_with)
    return _dom_parse_html(html)


# ---------------------------------------------------------------------------
# Thumbnail detection (`mod.rs:258-342`)
# ---------------------------------------------------------------------------


def check_for_thumbnail(ctx: Context) -> str | None:
    thumb = util.get_attribute(
        ctx, "//meta[contains(@name, 'twitter:image')]", "content")
    if thumb is not None:
        return thumb
    thumb = util.get_attribute(ctx, "//meta[contains(@name, 'og:image')]", "content")
    if thumb is not None:
        return thumb
    thumb = util.get_attribute(ctx, "//link[contains(@rel, 'image_src')]", "href")
    if thumb is not None:
        return thumb

    try:
        img_nodes = util.evaluate_xpath(ctx, "//img", True)
    except XPathError:
        img_nodes = []
    if img_nodes:
        scores: dict[str, int] = {}
        length = len(img_nodes)
        for index, img_node in enumerate(img_nodes):
            src = img_node.get_attribute("src")
            if src is None:
                continue
            score = util.score_image_url(src)
            score += util.score_img_attr(img_node)
            score += util.score_by_parents(img_node)
            score += util.score_by_sibling(img_node)
            score += util.score_by_dimensions(img_node)
            score += util.score_by_position(length, index)
            score += util.score_by_alt(img_node)
            scores[src] = score
        if scores:
            # HashMap::max_by_key keeps the LAST max on ties; dict order is
            # insertion order, so emulate by scanning with >=.
            top_src, top_score = None, None
            for src, score in scores.items():
                if top_score is None or score >= top_score:
                    top_src, top_score = src, score
            if top_score is not None and top_score > 0:
                if parse_ok(top_src.strip()):
                    return top_src.strip()

    try:
        link_nodes = util.evaluate_xpath(ctx, constants.LEAD_IMAGE_URL_XPATH, True)
    except XPathError:
        link_nodes = []
    if link_nodes:
        first = link_nodes[0]
        for attr in ("src", "href", "value"):
            v = first.get_attribute(attr)
            if v is not None:
                v = v.strip()
                if parse_ok(v):
                    return v
    return None


# ---------------------------------------------------------------------------
# prep_content and its helpers (`mod.rs:344-733`)
# ---------------------------------------------------------------------------


def fix_lazy_images(ctx: Context, doc: Document) -> None:
    # `mod.rs` evaluates //img, //picture, //figure and concatenates the
    # three node-sets BEFORE any mutation — one fused DFS is equivalent
    lists = util.collect_elements_by_tags(doc, ("img", "picture", "figure"))
    img_nodes = lists["img"] + lists["picture"] + lists["figure"]

    for node in img_nodes:
        tag_name = node.get_name().upper()
        src = node.get_attribute("src")
        if src is not None:
            m = constants.BASE64_DATA_URL.search(src)
            if m is not None and m.group(1) == "image/svg+xml":
                continue
            src_could_be_removed = False
            for name, val in node.get_attributes():
                if name == "src":
                    continue
                if constants.IS_IMAGE.search(val):
                    src_could_be_removed = True
                    break
            if src_could_be_removed:
                b64m = constants.IS_BASE64.search(src)
                if b64m is not None:
                    b64starts = b64m.start() + 7
                    b64length = util.blen(src) - b64starts
                    if b64length < 133:
                        node.remove_attribute("src")

        class_contains_lazy = "lazy" in (node.get_attribute("class") or "").lower()
        has_src = node.has_attribute("src")
        has_srcset = node.has_attribute("srcset")
        if (has_src or has_srcset) and not class_contains_lazy:
            continue

        for name, val in node.get_attributes():
            if name in ("src", "srcset", "alt"):
                continue
            copy_to = None
            if constants.COPY_TO_SRCSET.search(val):
                copy_to = "srcset"
            elif constants.COPY_TO_SRC.search(val):
                copy_to = "src"
            if copy_to is not None:
                if tag_name in ("IMG", "PICTURE"):
                    node.set_attribute(copy_to, val)
                elif tag_name == "FIGURE" and not util.has_any_descendent_tag(
                    node, frozenset(("IMG", "PICTURE"))
                ):
                    img = Node.new_element("img", doc)
                    img.set_attribute(copy_to, val)
                    node.add_child(img)


def fix_iframe_size(ctx: Context, site_name: str) -> None:
    nodes = util.evaluate_xpath(
        ctx, f"//iframe[contains(@src, '{site_name}')]", False)
    for node in nodes:
        parent = node.get_parent()
        if parent is None or isinstance(parent, Document):
            continue
        # Faithful to `mod.rs:445-462`: the ok_or_else closure never runs
        # (set_property can't fail), so the iframe is NOT moved — an empty
        # <div class="videoWrapper"> is appended and the iframe is resized
        # in place (attribute order preserved on update).
        video_wrapper = parent.new_child(None, "div")
        video_wrapper.set_property("class", "videoWrapper")
        node.set_property("width", "480")
        node.set_property("height", "360")
        node.set_property("aspect-ratio", "auto")


def remove_attribute(ctx: Context, tag: str | None, attribute: str) -> None:
    xpath_tag = tag if tag is not None else "*"
    nodes = util.evaluate_xpath(ctx, f"//{xpath_tag}[@{attribute}]", False)
    for node in nodes:
        node.remove_property(attribute)


def repair_urls(ctx: Context, xpath: str, attribute: str, article_url: Url,
                document: Document) -> None:
    nodes = util.evaluate_xpath(ctx, xpath, False)
    _repair_url_nodes(nodes, attribute, article_url, document)


def _repair_url_nodes(nodes: list, attribute: str, article_url: Url,
                      document: Document) -> int:
    """repair_urls' per-node body over a pre-collected node list; returns
    the number of STRUCTURAL replacements (javascript: nodes swapped for
    text/span) so a fused caller knows when its collected lists went
    stale."""
    replaced = 0
    for node in nodes:
        url = node.get_attribute(attribute)
        if url is None:
            continue
        trimmed_url = url.strip()
        is_hash_url = url.startswith("#")
        try:
            Url.parse(url)
            is_relative_url = False
        except RelativeUrlError:
            is_relative_url = True
        except UrlError:
            is_relative_url = False
        is_javascript = "javascript:" in trimmed_url

        if not is_hash_url and node.get_name().upper() == "A":
            node.set_attribute("target", "_blank")

        srcset = node.get_attribute("srcset")
        if srcset is not None:
            parts = []
            for cap in constants.SRC_SET_URL.finditer(srcset):
                cap0, cap1 = cap.group(0), cap.group(1) or ""
                cap2, cap3 = cap.group(2) or "", cap.group(3) or ""
                try:
                    Url.parse(cap1)
                    rel = False
                except RelativeUrlError:
                    rel = True
                except UrlError:
                    rel = False
                if rel:
                    try:
                        completed = article_url.join(cap1).as_str()
                    except UrlError:
                        completed = ""
                    parts.append(f"{completed}{cap2}{cap3}")
                else:
                    parts.append(cap0)
            node.set_attribute("srcset", " ".join(parts))

        if is_hash_url:
            node.set_attribute(attribute, trimmed_url)
        elif is_relative_url:
            try:
                completed_url = article_url.join(trimmed_url)
            except UrlError:
                continue
            node.set_attribute(attribute, completed_url.as_str())
        elif is_javascript:
            child_nodes = node.get_child_nodes()
            child_count = len(child_nodes)
            first_child_is_text = bool(child_nodes) and child_nodes[0].is_text()
            parent = node.get_parent()
            if parent is not None and not isinstance(parent, Document):
                if child_count == 1 and first_child_is_text:
                    new_node = Node.new_text(node.get_content(), document)
                else:
                    new_node = Node.new_element("span", document)
                    for child in child_nodes:
                        new_node.add_child(child)
                parent.replace_child_node(new_node, node)
                replaced += 1
        else:
            try:
                parsed_url = Url.parse(trimmed_url)
                node.set_attribute(attribute, parsed_url.as_str())
            except UrlError:
                node.set_attribute(attribute, trimmed_url)
    return replaced


_FIX_URL_TAGS = ("img", "a", "object", "iframe")
_FIX_URL_PASSES = (("img", "src"), ("a", "src"), ("a", "href"),
                   ("object", "data"), ("iframe", "src"))


def fix_urls(ctx: Context, url: Url, document: Document) -> None:
    """`mod.rs` runs five sequential //tag repairs; the five full-tree
    XPath walks fuse into ONE collection DFS (NOTES.md hot-list #2).
    Attribute rewrites never change the //tag node-sets, so the collected
    lists stay exact — except the rare javascript: structural replacement,
    after which the remaining passes re-collect to see precisely what a
    fresh eval would."""
    lists = util.collect_elements_by_tags(document, _FIX_URL_TAGS)
    for i, (tag, attr) in enumerate(_FIX_URL_PASSES):
        replaced = _repair_url_nodes(lists[tag], attr, url, document)
        if replaced and i + 1 < len(_FIX_URL_PASSES):
            lists = util.collect_elements_by_tags(document, _FIX_URL_TAGS)


def prep_content(ctx: Context, config: ConfigEntry | None,
                 global_config: ConfigEntry, url: Url, document: Document,
                 title: str | None) -> None:
    """`mod.rs:600-733` — ordered generic DOM cleanup."""
    # //h1, //h2, //font fused into one DFS.  The original //h2 eval runs
    # AFTER the h1->h2 renames, so its node-set is exactly the doc-order
    # union of original h2s and renamed h1s — which is precisely the
    # collected h1+h2 list (one ordered walk, tag checked at collect time).
    _hdr = util.collect_elements_ordered(document, ("h1", "h2", "font"))
    _h1s = [n for n in _hdr if n.name == "h1"]
    _h2s_after_rename = [n for n in _hdr if n.name != "font"]  # doc-order h1∪h2
    _fonts = [n for n in _hdr if n.name == "font"]
    for h1_node in _h1s:
        h1_node.set_name("h2")

    for h2_node in _h2s_after_rename:
        if util.header_duplicates_title(h2_node, title):
            h2_node.unlink()

    for font_node in _fonts:
        font_node.set_name("span")

    util.mark_data_tables(ctx)

    if config is not None:
        for xpath_strip in config.xpath_strip:
            util.strip_node(ctx, xpath_strip)
    for xpath_strip in global_config.xpath_strip:
        util.strip_node(ctx, xpath_strip)

    if config is not None:
        for cls in config.strip_id_or_class:
            util.strip_id_or_class(ctx, cls)
    for cls in global_config.strip_id_or_class:
        util.strip_id_or_class(ctx, cls)

    if config is not None:
        for img_src in config.strip_image_src:
            util.strip_node(ctx, f"//img[contains(@src,'{img_src}')]")
    for img_src in global_config.strip_image_src:
        util.strip_node(ctx, f"//img[contains(@src,'{img_src}')]")

    unwrap_noscript_images(ctx)
    util.strip_node(ctx, "//noscript")

    fix_lazy_images(ctx, document)
    fix_iframe_size(ctx, "youtube.com")
    # three //tag[@attr] scans fused into one DFS: attribute removal never
    # changes the element sets, so filtering the collected lists is
    # result-identical to the three sequential evals
    _attr_lists = util.collect_elements_by_tags(document, ("a", "img"))
    for _n in _attr_lists["a"]:
        if _n.has_attribute("onclick"):
            _n.remove_property("onclick")
    for _attr in ("decoding", "loading"):
        for _n in _attr_lists["img"]:
            if _n.has_attribute(_attr):
                _n.remove_property(_attr)

    util.strip_node(
        ctx,
        "//*[contains(@class,' entry-unrelated ') or contains(@class,' instapaper_ignore ')]",
    )

    util.strip_node(ctx, "//*[contains(@style,'display:none')]")
    util.strip_node(ctx, "//*[contains(@style,'display: none')]")
    remove_attribute(ctx, None, "style")

    # The 13 unconditional tag strips + comment strip are fused into ONE
    # collection DFS and processed in the reference's exact order.  This is
    # result-equivalent to sequential strip_node calls: removals of other
    # tags never change a tag's own match set observably (unlinking an
    # already-detached node is a no-op), and the two live XPath strips in
    # the middle see the identical tree state as in the sequential chain.
    collected: dict[str, list] = {
        t: [] for t in ("form", "input", "textarea", "select", "button",
                        "script", "style", "iframe", "object", "embed",
                        "footer", "link", "aside")
    }
    comments: list = []
    root_el = document.get_root_element()
    if root_el is not None:
        stack = [root_el]
        while stack:
            n = stack.pop()
            if n.type == 1:  # element
                lst = collected.get(n.name)
                if lst is not None:
                    lst.append(n)
                if n.children:
                    stack.extend(reversed(n.children))
            elif n.type == 8:  # comment
                comments.append(n)

    for tag in ("form", "input", "textarea", "select", "button"):
        util.strip_collected(collected[tag])
    util.strip_collected(comments)
    util.strip_collected(collected["script"])
    util.strip_collected(collected["style"])
    util.strip_node(ctx, "//a[not(node())]")
    util.strip_node(ctx, "//*[@type='text/css']")
    for tag in ("iframe", "object", "embed", "footer", "link", "aside"):
        util.strip_collected(collected[tag])

    root = document.get_root_element()
    if root is not None:
        util.replace_brs(root, document)
        util.replace_emoji_images(root, document)

    fix_urls(ctx, url, document)


def unwrap_noscript_images(ctx: Context) -> None:
    """`mod.rs:741-838`."""
    img_nodes = util.evaluate_xpath(ctx, "//img", False)
    for img_node in img_nodes:
        attrs = img_node.get_attributes()
        keep = any(
            name in ("src", "srcset", "data-src", "data-srcset")
            or constants.IS_IMAGE.search(value)
            for name, value in attrs
        )
        if not keep:
            img_node.unlink()

    noscript_nodes = util.evaluate_xpath(ctx, "//noscript", False)
    for noscript_node in noscript_nodes:
        if not util.is_single_image(noscript_node):
            continue
        prev = noscript_node.get_prev_element_sibling()
        if prev is None or not util.is_single_image(prev):
            continue
        prev_img = prev
        if prev_img.get_name().upper() != "IMG":
            found = util.get_elements_by_tag_name(prev_img, "img")
            if found:
                prev_img = found[0]
        new_imgs = util.get_elements_by_tag_name(noscript_node, "img")
        if new_imgs:
            new_img = new_imgs[0]
            for key, value in prev_img.get_attributes():
                if value == "":
                    continue
                if key in ("src", "srcset") or constants.IS_IMAGE.search(value):
                    if new_img.get_attribute(key) == value:
                        continue
                    attr_name = key
                    if new_img.has_attribute(attr_name):
                        attr_name = f"data-old-{attr_name}"
                    new_img.set_attribute(attr_name, value)
        parent = noscript_node.get_parent()
        if parent is not None and not isinstance(parent, Document):
            first_child = noscript_node.get_first_element_child()
            if first_child is not None:
                parent.replace_child_node(first_child, prev)
                noscript_node.unlink()


# ---------------------------------------------------------------------------
# FTR body extraction (`mod.rs:840-897`)
# ---------------------------------------------------------------------------


def extract_body(ctx: Context, root: Node, config: ConfigEntry | None,
                 global_config: ConfigEntry) -> bool:
    found_something = False
    if config is not None:
        for xpath_body in config.xpath_body:
            if extract_body_single(ctx, root, xpath_body):
                found_something = True
    if not found_something:
        for xpath_body in global_config.xpath_body:
            if extract_body_single(ctx, root, xpath_body):
                found_something = True
    return found_something


def extract_body_single(ctx: Context, root: Node, xpath: str) -> bool:
    found_something = False
    try:
        nodes = util.evaluate_xpath(ctx, xpath, False)
    except XPathError:
        return False
    for node in nodes:
        if not isinstance(node, Node):
            continue
        if node.get_property("style") is not None:
            node.remove_property("style")
        post_process_page(node)
        root.add_child(node)
        found_something = True
    return found_something


# ---------------------------------------------------------------------------
# Post-processing (`mod.rs:899-1132`)
# ---------------------------------------------------------------------------


def prevent_self_closing_tags(ctx: Context) -> None:
    for node in util.evaluate_xpath(ctx, "//*[not(node())]", False):
        if node.get_name().upper() in constants.VALID_SELF_CLOSING_TAGS:
            continue
        node.add_text_child(None, "empty", "")


def post_process_document(document: Document) -> None:
    root = document.get_root_element()
    if root is not None:
        simplify_nested_elements(root)
        clean_attributes(root)
        remove_single_cell_tables(root)
        remove_extra_p_and_div(root)


def post_process_page(node: Node) -> None:
    util.clean_headers(node)
    util.replace_schema_org_objects(node)
    util.clean_conditionally(node, "fieldset")
    util.clean_conditionally(node, "table")
    util.clean_conditionally(node, "ul")
    util.clean_conditionally(node, "div")
    remove_share_elements(node)
    clean_attributes(node)
    remove_single_cell_tables(node)
    remove_extra_p_and_div(node)
    remove_empty_nodes(node)


def remove_single_cell_tables(root: Node) -> None:
    node_iter: Node | None = root
    while node_iter is not None:
        node = node_iter
        if node.get_name().upper() == "TABLE":
            t_body = (
                node.get_child_elements()[0]
                if util.has_single_tag_inside_element(node, "TBODY")
                else node
            )
            if util.has_single_tag_inside_element(t_body, "TR"):
                rows = t_body.get_child_elements()
                row = rows[0] if rows else None
                if row is not None and util.has_single_tag_inside_element(row, "TD"):
                    cells = row.get_child_elements()
                    cell = cells[0] if cells else None
                    if cell is not None:
                        all_phrasing = all(
                            util.is_phrasing_content(c)
                            for c in cell.get_child_elements()
                        )
                        cell.set_name("P" if all_phrasing else "DIV")
                        parent = node.get_parent()
                        if parent is not None and not isinstance(parent, Document):
                            node_iter = util.next_node(node, True)
                            parent.replace_child_node(cell, node)
                            continue
        node_iter = util.next_node(node, False)


_MEDIA_TAGS_UPPER = frozenset(("IMG", "EMBED", "OBJECT", "IFRAME"))


def remove_extra_p_and_div(root: Node) -> None:
    node_iter: Node | None = root
    while node_iter is not None:
        node = node_iter
        tag_name = node.get_name().upper()
        if tag_name in ("P", "DIV"):
            # four subtree scans fused into one (count-additive: the tag
            # sets are disjoint, so one walk counting any of them equals
            # the sum of four single-tag walks)
            total = len(util.get_elements_by_tag_names(
                node, _MEDIA_TAGS_UPPER))
            if total == 0 and util.get_inner_text(node, False).strip() == "":
                node_iter = util.remove_and_next(node)
                continue
        node_iter = util.next_node(node, False)


def remove_share_elements(root: Node) -> None:
    node_iter: Node | None = root
    while node_iter is not None:
        node = node_iter
        match_string = (
            f"{node.get_attribute('class') or ''} {node.get_attribute('id') or ''}"
        )
        if (
            constants.SHARE_ELEMENTS.search(match_string)
            and util.blen(node.get_content()) < constants.DEFAULT_CHAR_THRESHOLD
        ):
            node_iter = util.remove_and_next(node)
        else:
            node_iter = util.next_node(node, False)


def clean_attributes(root: Node) -> None:
    node_iter: Node | None = root
    while node_iter is not None:
        node = node_iter
        if node.attrs:  # skip attr churn on attribute-less/text nodes
            tag_name = node.get_name().upper()
            for attr in constants.PRESENTATIONAL_ATTRIBUTES:
                node.remove_attribute(attr)
            if tag_name in constants.DEPRECATED_SIZE_ATTRIBUTE_ELEMS:
                node.remove_attribute("width")
                node.remove_attribute("height")
            node.remove_attribute("class")
            node.remove_attribute("align")
            node.remove_attribute(constants.SCORE_ATTR)
            node.remove_attribute(constants.DATA_TABLE_ATTR)
        node_iter = util.next_node(node, False)


def simplify_nested_elements(root: Node) -> None:
    node_iter: Node | None = root
    while node_iter is not None:
        node = node_iter
        tag_name = node.get_name().upper()
        parent = node.get_parent()
        if tag_name == "ARTICLE" or parent is None or isinstance(parent, Document):
            node_iter = util.next_node(node, False)
            continue
        if tag_name not in ("DIV", "SECTION"):
            node_iter = util.next_node(node, False)
            continue
        if util.is_element_without_content(node):
            node_iter = util.remove_and_next(node)
            continue
        if util.has_single_tag_inside_element(node, "DIV") or \
                util.has_single_tag_inside_element(node, "SECTION"):
            child = node.get_first_element_child()
            if child is not None:
                for k, v in node.get_attributes():
                    child.set_attribute(k, v)
                parent.replace_child_node(child, node)
                node_iter = util.next_node(parent, False)
                continue
        node_iter = util.next_node(node, False)


def remove_empty_nodes(root: Node) -> None:
    node_iter: Node | None = root
    while node_iter is not None:
        node = node_iter
        if node.get_name().upper() in constants.VALID_EMPTY_TAGS:
            node_iter = util.next_node(node, False)
            continue
        if util.is_element_without_children(node):
            node_iter = util.remove_and_next(node)
            continue
        node_iter = util.next_node(node, False)

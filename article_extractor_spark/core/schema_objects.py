"""schema.org ImageObject / VideoObject rewriting.

Semantics port of `/root/reference/src/image_object.rs:14-118` and
`/root/reference/src/video_object.rs:13-133`."""

from __future__ import annotations

from .dom import Document, Node
from .urlutil import Url, UrlError
from . import util


def _parse_u32(v: str) -> int | None:
    s = v
    if s.startswith("+"):
        s = s[1:]
    if s and all("0" <= c <= "9" for c in s):
        n = int(s)
        return n if n <= 0xFFFFFFFF else None
    return None


class ImageObject:
    def __init__(self, width, height, url: Url | None, description, name):
        self.width = width
        self.height = height
        self.url = url
        self.description = description
        self.name = name

    @staticmethod
    def parse_node(node: Node) -> "ImageObject | None":
        if node.get_name().upper() != "DIV":
            return None
        item_prop_image = node.get_attribute("itemprop") == "image"
        item_type_image = (
            node.get_attribute("itemtype") == "https://schema.org/ImageObject"
        )
        if not item_prop_image and not item_type_image:
            return None
        width = height = url = description = name = None
        for meta_node in util.get_elements_by_tag_name(node, "meta"):
            item_prop = meta_node.get_attribute("itemprop")
            content_prop = meta_node.get_attribute("content")
            if item_prop is not None and content_prop is not None:
                if item_prop == "width":
                    width = _parse_u32(content_prop)
                elif item_prop == "height":
                    height = _parse_u32(content_prop)
                elif item_prop == "url":
                    try:
                        url = Url.parse(content_prop)
                    except UrlError:
                        url = None
                elif item_prop == "description":
                    description = content_prop
                elif item_prop == "name":
                    name = content_prop
        if url is None:
            return None
        return ImageObject(width, height, url, description, name)

    def replace(self, node: Node) -> None:
        parent = node.get_parent()
        if parent is None or isinstance(parent, Document):
            return
        if parent.get_name().upper() == "A":
            self.replace(parent)
            return
        node.unlink()
        root = parent.new_child(None, "imageobject")
        a = root.new_child(None, "a")
        img = a.new_child(None, "img")
        if self.width is not None:
            img.set_attribute("width", str(self.width))
        if self.height is not None:
            img.set_attribute("height", str(self.height))
        if self.description is not None:
            img.set_attribute("alt", self.description)
        if self.name is not None:
            img.set_attribute("title", self.name)
        if self.url is not None:
            a.set_attribute("href", self.url.as_str())
            img.set_attribute("src", self.url.as_str())


class VideoObject:
    def __init__(self, thumbnail_url, content_url, embed_url, description, name):
        self.thumbnail_url = thumbnail_url
        self.content_url = content_url
        self.embed_url = embed_url
        self.description = description
        self.name = name

    @staticmethod
    def parse_node(node: Node) -> "VideoObject | None":
        if node.get_name().upper() != "DIV":
            return None
        item_prop_video = node.get_attribute("itemprop") == "video"
        item_type_video = (
            node.get_attribute("itemtype") == "http://schema.org/VideoObject"
        )
        if not item_prop_video and not item_type_video:
            return None
        thumbnail_url = content_url = embed_url = description = name = None
        for meta_node in util.get_elements_by_tag_name(node, "meta"):
            item_prop = meta_node.get_attribute("itemprop")
            content_prop = meta_node.get_attribute("content")
            if item_prop is not None and content_prop is not None:
                if item_prop == "thumbnailUrl":
                    thumbnail_url = content_prop
                elif item_prop == "contentURL":
                    content_url = VideoObject._parse_url(content_prop)
                elif item_prop == "embedURL":
                    embed_url = VideoObject._parse_url(content_prop)
                elif item_prop == "description":
                    description = content_prop
                elif item_prop == "name":
                    name = content_prop
        if (
            thumbnail_url is None
            and content_url is None
            and embed_url is None
            and description is None
            and name is None
        ):
            return None
        return VideoObject(thumbnail_url, content_url, embed_url, description, name)

    @staticmethod
    def _parse_url(url: str) -> Url | None:
        if url.startswith("//"):
            url = f"https:{url}"
        try:
            return Url.parse(url)
        except UrlError:
            return None

    def replace(self, node: Node) -> None:
        parent = node.get_parent()
        if parent is None or isinstance(parent, Document):
            return
        node.unlink()
        root = parent.new_child(None, "videoobject")
        if self.name is not None:
            title = root.new_child(None, "h3")
            title.set_content(self.name)
        if self.name != self.description and self.description is not None:
            desc = root.new_child(None, "p")
            desc.set_content(self.description)
        a = root.new_child(None, "a")
        if self.embed_url is not None:
            a.set_attribute("href", self.embed_url.as_str())
        elif self.content_url is not None:
            a.set_attribute("href", self.content_url.as_str())
        img = a.new_child(None, "img")
        if self.thumbnail_url is not None:
            img.set_attribute("src", self.thumbnail_url)

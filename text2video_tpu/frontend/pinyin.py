"""Hanzi -> pinyin conversion (lazy_pinyin-equivalent, self-contained).

The reference uses pypinyin's ``lazy_pinyin`` (reference:
pinyin_timestamping.py:42) to turn input text into toneless pinyin
syllables. pypinyin is not in this environment, so this module provides:

  * a built-in table of common hanzi (toneless pinyin), extendable at
    runtime via :func:`load_table` from a user TSV (``<char>\t<pinyin>``,
    e.g. derived from Unihan kMandarin);
  * :func:`to_pinyin` with lazy_pinyin's grouping behavior: each hanzi
    becomes one syllable token, consecutive non-hanzi characters (ASCII
    words, digit runs) group into one token, unknown hanzi pass through
    as themselves.
"""

from __future__ import annotations

from typing import Dict, List

# Common-character table (toneless). Covers the demo dictionaries'
# vocabulary (prompts/all_pinyin.txt syllable inventory) for everyday
# sentences; extend with load_table for production use.
_TABLE: Dict[str, str] = {
    "我": "wo", "你": "ni", "他": "ta", "她": "ta", "它": "ta",
    "们": "men", "的": "de", "了": "le", "是": "shi", "在": "zai",
    "有": "you", "和": "he", "不": "bu", "人": "ren", "这": "zhe",
    "那": "na", "个": "ge", "中": "zhong", "国": "guo", "大": "da",
    "小": "xiao", "上": "shang", "下": "xia", "来": "lai", "去": "qu",
    "说": "shuo", "话": "hua", "好": "hao", "看": "kan", "听": "ting",
    "见": "jian", "天": "tian", "年": "nian", "月": "yue", "日": "ri",
    "时": "shi", "分": "fen", "秒": "miao", "今": "jin", "明": "ming",
    "昨": "zuo", "前": "qian", "后": "hou", "左": "zuo", "右": "you",
    "东": "dong", "南": "nan", "西": "xi", "北": "bei", "京": "jing",
    "会": "hui", "能": "neng", "可": "ke", "以": "yi", "要": "yao",
    "想": "xiang", "知": "zhi", "道": "dao", "得": "de", "很": "hen",
    "都": "dou", "也": "ye", "就": "jiu", "还": "hai", "没": "mei",
    "再": "zai", "请": "qing", "谢": "xie", "对": "dui", "起": "qi",
    "名": "ming", "字": "zi", "什": "shen", "么": "me", "谁": "shui",
    "哪": "na", "里": "li", "几": "ji", "多": "duo", "少": "shao",
    "钱": "qian", "买": "mai", "卖": "mai", "吃": "chi", "喝": "he",
    "水": "shui", "饭": "fan", "茶": "cha", "家": "jia", "学": "xue",
    "校": "xiao", "生": "sheng", "老": "lao", "师": "shi", "同": "tong",
    "工": "gong", "作": "zuo", "公": "gong", "司": "si", "电": "dian",
    "脑": "nao", "手": "shou", "机": "ji", "车": "che", "路": "lu",
    "走": "zou", "跑": "pao", "飞": "fei", "高": "gao", "兴": "xing",
    "欢": "huan", "迎": "ying", "爱": "ai", "心": "xin", "情": "qing",
    "朋": "peng", "友": "you", "男": "nan", "女": "nv", "孩": "hai",
    "子": "zi", "妈": "ma", "爸": "ba", "哥": "ge", "姐": "jie",
    "弟": "di", "妹": "mei", "先": "xian", "世": "shi", "界": "jie",
    "新": "xin", "闻": "wen", "报": "bao", "目": "mu", "标": "biao",
    "支": "zhi", "持": "chi", "发": "fa", "展": "zhan", "经": "jing",
    "济": "ji", "文": "wen", "化": "hua", "教": "jiao", "育": "yu",
    "科": "ke", "技": "ji", "术": "shu", "研": "yan", "究": "jiu",
    "方": "fang", "法": "fa", "问": "wen", "题": "ti", "答": "da",
    "案": "an", "开": "kai", "始": "shi", "结": "jie", "束": "shu",
    "百": "bai", "千": "qian", "万": "wan", "亿": "yi", "零": "ling",
    "一": "yi", "二": "er", "三": "san", "四": "si", "五": "wu",
    "六": "liu", "七": "qi", "八": "ba", "九": "jiu", "十": "shi",
    "跨": "kua", "越": "yue", "河": "he", "山": "shan", "海": "hai",
    "州": "zhou", "省": "sheng", "市": "shi", "县": "xian", "区": "qu",
    "长": "chang", "短": "duan", "快": "kuai", "慢": "man", "早": "zao",
    "晚": "wan", "白": "bai", "黑": "hei", "红": "hong", "绿": "lv",
    "蓝": "lan", "黄": "huang", "色": "se", "视": "shi", "频": "pin",
    "音": "yin", "乐": "le", "歌": "ge", "唱": "chang", "画": "hua",
    "图": "tu", "片": "pian", "真": "zhen", "假": "jia", "正": "zheng",
    "反": "fan", "面": "mian", "点": "dian", "样": "yang", "用": "yong",
    "让": "rang", "给": "gei", "从": "cong", "向": "xiang", "到": "dao",
    "把": "ba", "被": "bei", "因": "yin", "为": "wei", "所": "suo",
    "但": "dan", "而": "er", "与": "yu", "或": "huo", "者": "zhe",
    "之": "zhi", "于": "yu", "及": "ji", "等": "deng", "各": "ge",
    "每": "mei", "己": "ji", "自": "zi", "身": "shen", "体": "ti",
    "头": "tou", "眼": "yan", "睛": "jing", "耳": "er", "口": "kou",
    "嘴": "zui", "脸": "lian", "笑": "xiao", "哭": "ku", "声": "sheng",
}


def _is_hanzi(ch: str) -> bool:
    return "一" <= ch <= "鿿"


def load_table(path: str) -> None:
    """Extend the built-in table from a TSV of ``<char>\t<pinyin>``."""
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2 and len(parts[0]) == 1:
                _TABLE[parts[0]] = parts[1]


def add_entries(entries: Dict[str, str]) -> None:
    _TABLE.update(entries)


def to_pinyin(text: str) -> List[str]:
    """lazy_pinyin-equivalent token stream.

    Hanzi -> one toneless syllable each; consecutive non-hanzi characters
    group into one token (so a digit run like "2024" is one numeric
    token, matching pinyin_timestamping.py:112's ``isnumeric`` handling);
    unknown hanzi pass through unchanged.
    """
    out: List[str] = []
    buf = ""
    for ch in text:
        if _is_hanzi(ch):
            if buf:
                out.append(buf)
                buf = ""
            out.append(_TABLE.get(ch, ch))
        else:
            buf += ch
    if buf:
        out.append(buf)
    return out

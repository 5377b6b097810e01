"""Extension → category mapping (behavior parity with od_util.py:30-150).

Stored as per-category extension strings and expanded to a dict at import;
quirks of the reference's final mapping are preserved ('pot'→application even
though listed among text types, 'mka'→video, 'vob:' literal, 'ts'→video,
'f'→archive).
"""

from __future__ import annotations

_BY_CATEGORY = {
    "application": (
        "bcpio bin cdf csh dll doc dot dvi eml exe hdf man me mht mhtml mif ms "
        "nc nws o obj oda p12 p7c pfx tr ppa pps ppt ps pwz pyc pyo ram rdf "
        "roff sh so src sv4cpio sv4crc t tcl tex texi texinfo ustar wiz wsdl "
        "xlb xls xpdl xsl torrent rpm deb atr class ttf img msi run drpm udeb "
        "patch nes ebuild scr pot"
    ),
    "text": (
        "java cpp rb bat latex xml etx htm c css csv html js json ksh pl py h "
        "tsv rtx sgm sgml txt vcf pdf epub srt inc php cbz docx mobi chm xlsx "
        "djvu rtf log md dsc info"
    ),
    "video": (
        "3g2 3gp asf asx avi flv swf vob: qt webm mov m1v m3u m3u8 movie mp4 "
        "mpa mpe mpeg mpg mkv wmv m4s ogv m4b m4v ts mka"
    ),
    "audio": (
        "wav snd mp2 aif iff m4a mid midi mp3 wma ra aifc aiff au flac ogg "
        "oga ac3"
    ),
    "image": (
        "bmp gif jpg xwd tif tiff png pnm ras ico ief pgm jpe pbm jpeg ppm "
        "xpm xbm rgb svg psd yuv ai eps bw hdr"
    ),
    "archive": (
        "ar cpio shar iso lbr mar sbx bz2 f gz lz lzma lzo rz sfark sz z 7z "
        "s7z ace afa alz apk arc arj b1 b6z a bh cab car cfs cpt dar dd dgc "
        "dmg ear gca ha hki ice jar kgb lzh lha lzx pak partimg paq6 paq7 "
        "paq8 pea pim pit qda rar rk sda sea sen sfx shk sit sitx sqx tbz2 "
        "tlz xz txz uc uc0 uc2 ucn ur2 ue2 uca uha war wim xar xp3 yz1 zip "
        "zipx zoo zpaq zz xpi tgz tbz tar bz diz"
    ),
}

CATEGORY_BY_EXT: dict[str, str] = {
    ext: cat for cat, exts in _BY_CATEGORY.items() for ext in exts.split()
}

IMAGE_EXTS: frozenset[str] = frozenset(
    e for e, c in CATEGORY_BY_EXT.items() if c == "image"
)


def get_category(extension: str) -> str | None:
    """Ref: od_util.py:149-150."""
    return CATEGORY_BY_EXT.get(extension)

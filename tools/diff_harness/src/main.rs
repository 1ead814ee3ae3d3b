//! Differential harness: runs the REFERENCE's exact HTML→text
//! extraction (rdf_knowledge_extractor src/handlers/mod.rs:109-140,
//! UrlHandler::extract_text minus the HTTP fetch) over files given on
//! the command line, printing one JSON line {"file":…, "text":…} per
//! input.  Diff these against the Python engine's extract_text to
//! verify the byte-identity invariant.
//!
//! Usage:
//!   cargo run --release -- page1.html page2.html …
//!   python tools/run_differential.py   # drives both sides end-to-end
//!
//! NOTE: building requires crates.io (scraper pinned to the
//! reference's lockfile version).  This sandbox has no network — see
//! DIFFERENTIAL.md for the evidence and the offline fallback suite.

use scraper::{Html, Selector};
use std::fs;

fn extract_text(html: &str) -> String {
    // Verbatim re-statement of the reference algorithm:
    let document = Html::parse_document(html);
    let mut text_parts = Vec::new();

    if let Ok(body_selector) = Selector::parse("body") {
        for element in document.select(&body_selector) {
            let text = element.text().collect::<Vec<_>>().join(" ");
            let trimmed = text.trim();
            if !trimmed.is_empty() {
                text_parts.push(trimmed.to_string());
            }
        }
    }

    if text_parts.is_empty() {
        if let Ok(all_selector) = Selector::parse("*") {
            for element in document.select(&all_selector) {
                if element.value().name() == "script" || element.value().name() == "style" {
                    continue;
                }
                let text = element.text().collect::<Vec<_>>().join(" ");
                let trimmed = text.trim();
                if !trimmed.is_empty() {
                    text_parts.push(trimmed.to_string());
                }
            }
        }
    }

    text_parts.join("\n")
}

fn json_escape(s: &str) -> String {
    let mut out = String::with_capacity(s.len() + 2);
    for c in s.chars() {
        match c {
            '"' => out.push_str("\\\""),
            '\\' => out.push_str("\\\\"),
            '\n' => out.push_str("\\n"),
            '\r' => out.push_str("\\r"),
            '\t' => out.push_str("\\t"),
            c if (c as u32) < 0x20 => out.push_str(&format!("\\u{:04x}", c as u32)),
            c => out.push(c),
        }
    }
    out
}

fn main() {
    for path in std::env::args().skip(1) {
        let bytes = fs::read(&path).expect("read input");
        let html = String::from_utf8_lossy(&bytes);
        let text = extract_text(&html);
        println!(
            "{{\"file\":\"{}\",\"text\":\"{}\"}}",
            json_escape(&path),
            json_escape(&text)
        );
    }
}
